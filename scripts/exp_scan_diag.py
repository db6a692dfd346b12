"""Diagnose the scan-timing discrepancy: pipelined harness says 0.028 ms
for a 205 MB HBM sweep (PERF.md's A/B measured 0.62 ms). Checks:
  1. the ACTUAL shipped _certified_scan through the same harness
  2. blocking per-call timing (subtract the ~28 ms tunnel RTT via a no-op)
  3. N-scaling (25k/50k/100k/200k): real compute scales, artifacts don't
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.ops import topk as T

D, P = 1024, 16


def make(n, rng):
    corpus = rng.standard_normal((n, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    cat, s1, bound = T.quantize_int8_residual(corpus)
    dev = jax.devices()[0]
    return (jax.device_put(jnp.asarray(cat), dev),
            jax.device_put(jnp.asarray(s1), dev))


def qbatches(m, rng):
    dev = jax.devices()[0]
    qb = rng.standard_normal((m, P, D), dtype=np.float32)
    qb /= np.linalg.norm(qb, axis=2, keepdims=True)
    out = [jax.device_put(jnp.asarray(qb[i]), dev) for i in range(m)]
    jax.block_until_ready(out)
    return out


def pipelined(fn, qs, *args, iters=200):
    jax.block_until_ready(fn(qs[0], *args))
    t0 = time.perf_counter()
    outs = [fn(qs[i % len(qs)], *args) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def blocking(fn, qs, *args, iters=24):
    jax.block_until_ready(fn(qs[0], *args))
    t0 = time.perf_counter()
    for i in range(iters):
        jax.block_until_ready(fn(qs[i % len(qs)], *args))
    return (time.perf_counter() - t0) / iters * 1e3


scan = jax.jit(lambda q, c, s: T._certified_scan(q, c, s))

noop = jax.jit(lambda q: q.sum())


def main():
    rng = np.random.default_rng(0)
    qs = qbatches(48, rng)

    # tunnel RTT via a trivial op
    rtt = blocking(noop, qs)
    print(f"noop blocking RTT                 {rtt:8.3f} ms", flush=True)

    for n in (25_000, 50_000, 100_000, 200_000):
        cat, s1 = make(n, rng)
        ms_p = pipelined(scan, qs, cat, s1)
        ms_b = blocking(scan, qs, cat, s1)
        print(f"shipped _certified_scan N={n:7d}  pipelined {ms_p:7.3f} ms   "
              f"blocking {ms_b:7.3f} ms   blk-rtt {ms_b - rtt:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
