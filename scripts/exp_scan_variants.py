"""One-off chip experiment: score-scan variants for the two-pass top-k.

Measures device time per scan call (pipelined dispatch, one drain) for:
  a) shipped dual-int8 upcast->bf16 dot over [N, 2d]
  b) pre-converted bf16 [N, 2d] dot (isolates the upcast cost)
  c) native int8 x int8 -> int32 dot over [N, 2d]
  d) native int8 x int8 -> int32 dot over hi channel only [N, d]
  e) upcast bf16 dot over hi channel only [N, d]

Counterpart experiment for PERF.md's "scan sits near its HBM +
int8-upcast floor" claim (reference: embed_utils.py:8-97 does fp32
torch mm on GPU/CPU).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.ops import topk as T

N, D, P = 100_000, 1024, 16
ITERS = 200


def bench(fn, qs, *args, iters=ITERS):
    """qs: list of DISTINCT device query batches (identical-args dispatches
    appear to be memoized by the remote runtime — a same-args loop measured
    0.015 ms/call, below the 0.25 ms HBM floor)."""
    out = fn(qs[0], *args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    outs = [fn(qs[i % len(qs)], *args) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((P, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_batches = rng.standard_normal((48, P, D), dtype=np.float32)
    q_batches /= np.linalg.norm(q_batches, axis=2, keepdims=True)

    cat, s1, bound = T.quantize_int8_residual(corpus)
    dev = jax.devices()[0]
    cat_d = jax.device_put(jnp.asarray(cat), dev)
    s1_d = jax.device_put(jnp.asarray(s1), dev)
    q_d = jax.device_put(jnp.asarray(q), dev)
    qs_d = [jax.device_put(jnp.asarray(q_batches[i]), dev) for i in range(q_batches.shape[0])]
    jax.block_until_ready(qs_d)
    hi_d = cat_d[:, :D]
    cat_bf16 = jax.device_put(jnp.asarray(cat, np.float32).astype(jnp.bfloat16), dev)
    hi_bf16 = cat_bf16[:, :D]

    # a) shipped: int8 [N,2d] upcast -> bf16 dot, fp32 accum, scaled
    @jax.jit
    def scan_shipped(qq, cc, ss):
        q2 = jnp.concatenate([qq, qq * (1.0 / 256.0)], axis=1)
        return jnp.dot(
            q2.astype(jnp.bfloat16), cc.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32) * ss[None, :]

    # b) pre-converted bf16 corpus
    @jax.jit
    def scan_bf16pre(qq, cc, ss):
        q2 = jnp.concatenate([qq, qq * (1.0 / 256.0)], axis=1)
        return jnp.dot(q2.astype(jnp.bfloat16), cc.T,
                       preferred_element_type=jnp.float32) * ss[None, :]

    # c) native int8 x int8 -> int32 over [N, 2d]; query quantized on device
    @jax.jit
    def scan_int8native(qq, cc, ss):
        q2 = jnp.concatenate([qq, qq * (1.0 / 256.0)], axis=1)
        qs = jnp.max(jnp.abs(q2), axis=1, keepdims=True) / 127.0
        qi = jnp.clip(jnp.round(q2 / qs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qi, cc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * qs * ss[None, :]

    # d) native int8 hi-channel only
    @jax.jit
    def scan_int8hi(qq, hh, ss):
        qs = jnp.max(jnp.abs(qq), axis=1, keepdims=True) / 127.0
        qi = jnp.clip(jnp.round(qq / qs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qi, hh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * qs * ss[None, :]

    # e) upcast bf16 hi-channel only
    @jax.jit
    def scan_hibf16(qq, hh, ss):
        return jnp.dot(qq.astype(jnp.bfloat16), hh.astype(jnp.bfloat16).T,
                       preferred_element_type=jnp.float32) * ss[None, :]

    for name, fn, args in [
        ("a_shipped_dual_upcast", scan_shipped, (cat_d, s1_d)),
        ("b_dual_bf16_prematerialized", scan_bf16pre, (cat_bf16, s1_d)),
        ("c_dual_int8_native", scan_int8native, (cat_d, s1_d)),
        ("d_hi_int8_native", scan_int8hi, (hi_d, s1_d)),
        ("e_hi_upcast_bf16", scan_hibf16, (hi_d, s1_d)),
    ]:
        ms = bench(fn, qs_d, *args)
        print(f"{name:32s} {ms:8.3f} ms/call", flush=True)

    # accuracy spot-check: max |score - fp32| for c) and d)
    ref = (q @ corpus.T)
    for name, fn, args in [
        ("c_dual_int8_native", scan_int8native, (q_d, cat_d, s1_d)),
        ("d_hi_int8_native", scan_int8hi, (q_d, hi_d, s1_d)),
        ("a_shipped_dual_upcast", scan_shipped, (q_d, cat_d, s1_d)),
    ]:
        s = np.asarray(fn(*args))
        print(f"{name:32s} max|err| vs fp32 = {np.abs(s - ref).max():.3e}")


if __name__ == "__main__":
    main()
