"""Chip A/B: topk_many group coalescing (group_rows) at the bench shape.

Mirrors bench.py's loops (distinct 16-query fan-out batches, window
pipelining, device-resident and host-upload variants) across group_rows.
Through the remote tunnel, per-message round-trips dominate; coalescing
G batches shares one corpus sweep and one fetch across G*P queries.
"""
from __future__ import annotations

import time

import numpy as np

N, D, P, K, ITERS = 100_000, 1024, 16, 50, 64


def main():
    import jax.numpy as jnp

    from comorag_tpu.retrieval.index import MipsIndex

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((P, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index = MipsIndex(corpus)
    assert index.scan_dtype == "int8"
    host_batches = [np.roll(queries, i % P, axis=0) for i in range(ITERS)]
    device_batches = [jnp.asarray(q) for q in host_batches]
    device_batches[0].block_until_ready()

    ref = index.topk(queries, k=K)[1]

    for gr in (1, 64, 128, 256, 512):
        # warm compile for this bucket
        index.topk_many(device_batches[: max(1, gr // P)], k=K, group_rows=gr)
        best_d = best_h = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            out = index.topk_many(device_batches, k=K, group_rows=gr)
            best_d = max(best_d, P * ITERS / (time.perf_counter() - t0))
            t0 = time.perf_counter()
            index.topk_many(host_batches, k=K, group_rows=gr)
            best_h = max(best_h, P * ITERS / (time.perf_counter() - t0))
        ok = np.array_equal(np.asarray(out[0][1]), ref)
        print(f"group_rows={gr:4d}  device {best_d:9.0f} qps   host {best_h:9.0f} qps   exact={ok}",
              flush=True)


if __name__ == "__main__":
    main()
