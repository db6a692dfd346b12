"""True device-time per scan: chain K corpus sweeps inside ONE executable.

block_until_ready does not wait through axon (no-op "blocking" RTT measured
0.077 ms vs the real ~29 ms fetch RTT), and per-result fetches are
RTT-bound.  So: lax.scan over K distinct query batches, each doing a full
corpus scan reduced to a scalar, carry-summed; fetch one scalar.
per-scan device time = (wall - RTT) / K.  The corpus (205 MB at N=100k,
int8 dual-channel) exceeds VMEM, so every iteration re-sweeps HBM —
no cross-iteration fusion is possible.

Variants timed: shipped dual-int8-upcast-bf16, native int8xint8->int32,
hi-channel-only int8 native (half the bytes).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.ops import topk as T

D, P, K = 1024, 16, 32


def chain(body):
    @jax.jit
    def run(qstack, cc, ss):
        def step(acc, q):
            return acc + body(q, cc, ss).sum(), None
        out, _ = jax.lax.scan(step, jnp.float32(0), qstack)
        return out
    return run


def shipped(q, cc, ss):
    return T._certified_scan(q, cc, ss)


def int8native(q, cc, ss):
    q2 = jnp.concatenate([q, q * (1.0 / 256.0)], axis=1)
    qs = jnp.max(jnp.abs(q2), axis=1, keepdims=True) / 127.0
    qi = jnp.clip(jnp.round(q2 / qs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(qi, cc, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * qs * ss[None, :]


def hi_int8(q, hh, ss):
    qs = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
    qi = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(qi, hh, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * qs * ss[None, :]


def main():
    rng = np.random.default_rng(0)
    n = 100_000
    corpus = rng.standard_normal((n, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    cat, s1, _ = T.quantize_int8_residual(corpus)
    dev = jax.devices()[0]
    cat_d = jax.device_put(jnp.asarray(cat), dev)
    s1_d = jax.device_put(jnp.asarray(s1), dev)
    hi_d = jax.device_put(jnp.asarray(cat[:, :D]).copy(), dev)
    qstack = rng.standard_normal((K, P, D), dtype=np.float32)
    qstack /= np.linalg.norm(qstack, axis=2, keepdims=True)
    q_d = jax.device_put(jnp.asarray(qstack), dev)

    # RTT baseline: trivial chained executable, one fetch
    noop = jax.jit(lambda q: q.sum())
    float(noop(q_d))
    t0 = time.perf_counter()
    for _ in range(4):
        float(noop(q_d))
    rtt = (time.perf_counter() - t0) / 4 * 1e3
    print(f"fetch RTT ~ {rtt:.2f} ms", flush=True)

    for name, body, cdata, nbytes in [
        ("a_shipped_dual_upcast", shipped, cat_d, cat.nbytes),
        ("c_dual_int8_native", int8native, cat_d, cat.nbytes),
        ("d_hi_int8_native", hi_int8, hi_d, cat.nbytes // 2),
    ]:
        run = chain(body)
        float(run(q_d, cdata, s1_d))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run(q_d, cdata, s1_d))
        wall = (time.perf_counter() - t0) / reps * 1e3
        per = (wall - rtt) / K
        gbs = nbytes / 1e9 / (per / 1e3)
        print(f"{name:26s} wall {wall:8.2f} ms  per-scan {per:7.3f} ms  "
              f"-> {gbs:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
