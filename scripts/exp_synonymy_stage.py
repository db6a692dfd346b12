"""Chip repro of the 200k synonymy KNN stage (graph.synonymy_edges 476 s
in the r4 e2e trace, vs ~82 s late-r3) using the REAL entity embeddings
left on disk by that run (/tmp/bench_e2e_whnubrob).

Variants:
  two_pass   — current default (int8-scan two-pass, pool c = k+8->112)
  fp32       — scan disabled (single-pass exact fp32, the late-r3 path)
  two_pass_c256 — two-pass with a wider rescue pool

Prints per-variant wall, trace rescue counters, and a dispatch/drain split.
"""
from __future__ import annotations

import sys
import time

import numpy as np

VEC = "/tmp/bench_e2e_whnubrob/outputs/fake_hash/entity_embeddings/vdb_entity_vec.parquet"


def main():
    import pandas as pd

    t0 = time.perf_counter()
    flat = pd.read_parquet(VEC)["values"].to_numpy(np.float32)
    embs = flat.reshape(-1, 256)  # hash encoder dim in the e2e run
    print(f"loaded {embs.shape} in {time.perf_counter()-t0:.1f}s", flush=True)
    n, d = embs.shape
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    embs = embs / np.maximum(norms, 1e-12)
    k = 103  # max_neighbors 100 + 2 + ~1 empty (builder.py:261)
    batches = [embs[i : i + 1000] for i in range(0, n, 1000)]

    from comorag_tpu.retrieval.index import MipsIndex
    from comorag_tpu.utils import trace

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = {
        "fp32": dict(scan_dtype=None),
        "two_pass": dict(),
        "two_pass_c256": dict(scan_candidates=256),
    }
    for name, kw in variants.items():
        if which not in ("all", name):
            continue
        trace.reset()
        t0 = time.perf_counter()
        index = MipsIndex(embs, **kw)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = index.topk_many(batches, k=k)
        wall = time.perf_counter() - t0
        counters = trace.summary()["counters"]
        print(
            f"{name:14s} build {t_build:6.1f}s  sweep {wall:7.1f}s "
            f"({n/wall:7.0f} rows/s)  counters={counters}",
            flush=True,
        )
        del index, outs


if __name__ == "__main__":
    main()
