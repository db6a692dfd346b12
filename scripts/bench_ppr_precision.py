"""PPR precision at scale: device fp32 tol-1e-7 vs native float64 tol-1e-10.

VERDICT r2 #7 evidence run: the device solver's fp32 L1 error floors near
1e-7 (tighter tolerances spin the while_loop without changing the fixed
point — see ops/ppr.py query()), while the native host solver iterates in
float64 at the exact configured tolerance. This script measures, on a
10M-arc graph at corpus-realistic shape, whether that precision gap can
disturb the ranking the engine actually consumes (top-50 passage ranks
per probe).

Usage (real chip, ~minutes):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ppr_precision.py \
        [--arcs 10000000] [--nodes 400000] [--batch 16] [--k 50]

Prints one JSON line with top-k agreement + max score deltas; results are
recorded in PERF.md ("PPR precision at scale").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arcs", type=int, default=10_000_000)
    ap.add_argument("--nodes", type=int, default=400_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from comorag_tpu.ops.ppr import PPRGraph

    rng = np.random.default_rng(args.seed)
    n = args.nodes
    m = args.arcs // 2  # undirected edges -> 2 arcs each
    # power-lawish degree mix: realistic graphs concentrate edges
    hubs = rng.integers(0, n // 20, m // 4)
    u = np.concatenate([rng.integers(0, n, m - len(hubs)), hubs]).astype(np.int32)
    v = rng.integers(0, n, m).astype(np.int32)
    keep = u != v
    u, v = u[keep], v[keep]
    w = (rng.random(len(u)) + 0.05).astype(np.float32)
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    ww = np.concatenate([w, w])

    # sparse seeds + dense prior over a passage block — the engine's shape
    b = args.batch
    n_docs = min(n // 2, 200_000)
    resets = np.zeros((b, n), np.float32)
    for row in range(b):
        seeds = rng.integers(n_docs, n, 8)
        resets[row, seeds] = rng.random(8).astype(np.float32)
        resets[row, :n_docs] += (rng.random(n_docs) * 0.005).astype(np.float32)

    dev = PPRGraph(src, dst, ww, n, backend="device", tol=1e-10, max_iters=128)
    nat = PPRGraph(src, dst, ww, n, backend="native", tol=1e-10, max_iters=128)
    assert nat._native is not None, "native solver unavailable"

    t0 = time.perf_counter()
    out_dev = dev.query(resets)  # device clamps tol to 1e-7 (fp32 floor)
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_nat = nat.query(resets)  # float64, exact 1e-10
    t_nat = time.perf_counter() - t0

    k = args.k
    agree = []
    margin_misses = 0
    for row in range(b):
        # rank the passage block only (what tri_retrieve consumes)
        d_rank = np.argsort(-out_dev[row, :n_docs], kind="stable")[:k]
        n_rank = np.argsort(-out_nat[row, :n_docs], kind="stable")[:k]
        inter = len(set(d_rank) & set(n_rank))
        agree.append(inter / k)
        if inter < k:
            # is any miss outside fp32 noise? compare the float64 score
            # gap at the boundary against the device's 1e-7 tol
            boundary = out_nat[row, :n_docs][n_rank[-1]]
            missed = set(n_rank) - set(d_rank)
            for node in missed:
                if out_nat[row, node] - boundary > 1e-6:
                    margin_misses += 1

    print(json.dumps({
        "metric": "ppr_topk_agreement_fp32_vs_f64",
        "arcs": int(len(src)),
        "nodes": n,
        "batch": b,
        "k": k,
        "mean_topk_agreement": round(float(np.mean(agree)), 6),
        "min_topk_agreement": round(float(np.min(agree)), 6),
        "misses_beyond_fp32_noise": margin_misses,
        "max_abs_score_delta": float(np.abs(out_dev - out_nat).max()),
        "device_s": round(t_dev, 3),
        "native_s": round(t_nat, 3),
    }))


if __name__ == "__main__":
    main()
