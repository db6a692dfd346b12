"""Ground-truth scan timing: force a HOST FETCH of each result.

The pipelined/blocking harnesses measured 0.02-0.06 ms per 205 MB scan
(impossible: v5e HBM ~819 GB/s -> >=0.25 ms), and a no-op blocking RTT of
0.077 ms vs the documented ~28 ms tunnel RTT.  Hypothesis: block_until_ready
through axon resolves without waiting for device completion.  A device_get
of a scalar REDUCED FROM the scan output cannot resolve early.

Measures sustained throughput: dispatch ITERS scans (distinct query
batches), each reduced to one scalar on device, then fetch all scalars;
wall time / ITERS is a hard lower bound on real per-scan device time
(minus one pipeline fill).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.ops import topk as T

D, P = 1024, 16
ITERS = 64


def main():
    dev = jax.devices()[0]
    print(f"devices: {jax.devices()}  platform={dev.platform}", flush=True)
    rng = np.random.default_rng(0)
    qb = rng.standard_normal((ITERS, P, D), dtype=np.float32)
    qb /= np.linalg.norm(qb, axis=2, keepdims=True)
    qs = [jax.device_put(jnp.asarray(qb[i]), dev) for i in range(ITERS)]
    jax.block_until_ready(qs)

    scan = jax.jit(lambda q, c, s: T._certified_scan(q, c, s).sum())

    for n in (100_000, 200_000):
        corpus = rng.standard_normal((n, D), dtype=np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        cat, s1, _ = T.quantize_int8_residual(corpus)
        cat_d = jax.device_put(jnp.asarray(cat), dev)
        s1_d = jax.device_put(jnp.asarray(s1), dev)
        # warm compile + one fetch
        float(scan(qs[0], cat_d, s1_d))
        t0 = time.perf_counter()
        outs = [scan(qs[i], cat_d, s1_d) for i in range(ITERS)]
        vals = [float(o) for o in outs]  # forced fetch of every result
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        gbs = cat.nbytes / 1e9 / (dt / 1e3)
        print(f"N={n:7d}  fetched {dt:7.3f} ms/scan  -> {gbs:7.1f} GB/s "
              f"(checksum {sum(vals):.3f})", flush=True)

    # serial fetch (one at a time) — includes full RTT per call
    n = 100_000
    corpus = rng.standard_normal((n, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    cat, s1, _ = T.quantize_int8_residual(corpus)
    cat_d = jax.device_put(jnp.asarray(cat), dev)
    s1_d = jax.device_put(jnp.asarray(s1), dev)
    float(scan(qs[0], cat_d, s1_d))
    t0 = time.perf_counter()
    for i in range(24):
        float(scan(qs[i], cat_d, s1_d))
    dt = (time.perf_counter() - t0) / 24 * 1e3
    print(f"N={n:7d}  serial-fetch {dt:7.3f} ms/call (incl RTT)", flush=True)


if __name__ == "__main__":
    main()
