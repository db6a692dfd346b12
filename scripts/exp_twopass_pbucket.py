"""Chip A/B: two-pass vs single-pass fp32 across QUERY BUCKET sizes.

The compressed scan pays off only while the scan matmul is HBM-bound;
arithmetic intensity grows with query rows P, so past a crossover the
single-pass fp32 path wins (and skips pool/rescore/certificate work).
Measured to set MipsIndex's auto-routing threshold.
"""
from __future__ import annotations

import time

import numpy as np


def sweep(index, batches, k, p):
    t0 = time.perf_counter()
    # group_rows=p: one dispatch per batch, so each trial measures the
    # per-bucket dispatch this script was written to compare (the shipped
    # default 256 would coalesce the small-P rows into shared dispatches)
    index.topk_many(batches, k=k, group_rows=p)
    return time.perf_counter() - t0


def main():
    from comorag_tpu.retrieval.index import MipsIndex

    rng = np.random.default_rng(0)
    for (n, d, k) in ((200_000, 256, 103), (100_000, 1024, 50)):
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        # explicit scan_dtype="int8" bypasses the auto route-to-fp32 at
        # large P (commit 0bff4eb) so the two_pass column really measures
        # the compressed scan at every bucket
        idx_tp = MipsIndex(corpus, scan_dtype="int8")
        idx_fp = MipsIndex(corpus, scan_dtype=None)
        print(f"== N={n} d={d} k={k}", flush=True)
        total = 4096
        for p in (16, 64, 128, 256, 512, 1024):
            qs = rng.standard_normal((total, d)).astype(np.float32)
            batches = [qs[i : i + p] for i in range(0, total, p)]
            # warm both (compile + cache), then best of 2
            t_tp = min(sweep(idx_tp, batches, k, p) for _ in range(3))
            t_fp = min(sweep(idx_fp, batches, k, p) for _ in range(3))
            print(
                f"  P={p:5d}  two_pass {total/t_tp:8.0f} q/s   "
                f"fp32 {total/t_fp:8.0f} q/s   ratio {t_fp/t_tp:5.2f}x",
                flush=True,
            )
        del idx_tp, idx_fp


if __name__ == "__main__":
    main()
