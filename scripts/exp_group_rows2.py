"""Chip A/B, round 2: topk_many group_rows with INTERLEAVED trials.

exp_group_rows.py ran each group_rows setting in its own sequential
section; tunnel throughput drifts minute-to-minute, which showed up as
a non-monotonic device column (gr=64 at 8.3k between 13.8k neighbors).
This harness warms every shape bucket first, then round-robins the
settings so drift hits them all equally, and reports best-of per
setting.
"""
from __future__ import annotations

import time

import numpy as np

N, D, P, K, ITERS, ROUNDS = 100_000, 1024, 16, 50, 64, 5
SETTINGS = (1, 128, 256, 512, 1024)


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

    # warm every shape bucket before any timing
    for gr in SETTINGS:
        index.topk_many(device_batches[: max(1, gr // P)], k=K, group_rows=gr)
        index.topk_many(host_batches[: max(1, gr // P)], k=K, group_rows=gr)

    best_d = {gr: 0.0 for gr in SETTINGS}
    best_h = {gr: 0.0 for gr in SETTINGS}
    for _ in range(ROUNDS):
        for gr in SETTINGS:
            t0 = time.perf_counter()
            out = index.topk_many(device_batches, k=K, group_rows=gr)
            best_d[gr] = max(best_d[gr], P * ITERS / (time.perf_counter() - t0))
            assert np.array_equal(np.asarray(out[0][1]), ref)
            t0 = time.perf_counter()
            index.topk_many(host_batches, k=K, group_rows=gr)
            best_h[gr] = max(best_h[gr], P * ITERS / (time.perf_counter() - t0))
    for gr in SETTINGS:
        print(
            f"group_rows={gr:5d}  device {best_d[gr]:9.0f} qps   host {best_h[gr]:9.0f} qps",
            flush=True,
        )


if __name__ == "__main__":
    main()
