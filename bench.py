"""Retrieval throughput benchmark (the BASELINE.json north star).

Measures batched MIPS top-k retrieval QPS on one chip — a probe fan-out of
P queries against an N x d chunk-embedding corpus, fused matmul + top-k —
and compares against the reference's retrieval path (torch-CPU ``mm`` +
``topk`` with batched key tiles, embed_utils.py:8-97 semantics) on the
same data.

Prints ONE JSON line:
  {"metric": "retrieval_qps_per_chip", "value": ..., "unit": "qps",
   "vs_baseline": <tpu_qps / cpu_reference_qps>}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Bench sizes: BASELINE config 3 scale — rerank over 10k+ chunks; we use
# 100k chunks x 1024-dim to be representative of a large narrative corpus.
N = int(os.environ.get("BENCH_N", 100_000))
DIM = int(os.environ.get("BENCH_DIM", 1024))
P = int(os.environ.get("BENCH_P", 16))  # probe fan-out per meta iteration
K = int(os.environ.get("BENCH_K", 50))  # qa_top_k default
TPU_ITERS = int(os.environ.get("BENCH_ITERS", 30))
CPU_ITERS = int(os.environ.get("BENCH_CPU_ITERS", 3))


def make_data():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((P, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return corpus, queries


def bench_tpu(corpus: np.ndarray, queries: np.ndarray) -> tuple[float, np.ndarray]:
    import jax

    from comorag_tpu.retrieval.index import MipsIndex

    index = MipsIndex(corpus)
    # warmup + compile
    scores, idx = index.topk(queries, k=K)
    start = time.perf_counter()
    for _ in range(TPU_ITERS):
        scores, idx = index.topk(queries, k=K)
    elapsed = time.perf_counter() - start
    qps = P * TPU_ITERS / elapsed
    return qps, idx


def bench_cpu_reference(corpus: np.ndarray, queries: np.ndarray) -> tuple[float, np.ndarray]:
    """The reference's device-agnostic retrieval loop (torch mm + topk over
    key batches, two-level top-k merge), running on CPU as it does without
    CUDA."""
    import torch

    q = torch.from_numpy(queries)
    key_batch = 10_000  # synonymy_edge_key_batch_size default
    keys = torch.from_numpy(corpus)
    idx_out = None
    start = time.perf_counter()
    for _ in range(CPU_ITERS):
        all_scores, all_idx = [], []
        offset = 0
        for i in range(0, len(keys), key_batch):
            kb = keys[i : i + key_batch]
            sim = torch.mm(q, kb.T)
            s, ix = torch.topk(sim, min(K, kb.shape[0]), dim=1, largest=True, sorted=True)
            all_scores.append(s)
            all_idx.append(ix + offset)
            offset += kb.shape[0]
        cat_s = torch.cat(all_scores, dim=1)
        cat_i = torch.cat(all_idx, dim=1)
        final_s, pos = torch.topk(cat_s, min(K, cat_s.shape[1]), dim=1, largest=True, sorted=True)
        idx_out = torch.gather(cat_i, 1, pos)
    elapsed = time.perf_counter() - start
    qps = P * CPU_ITERS / elapsed
    return qps, idx_out.numpy()


def main() -> None:
    corpus, queries = make_data()
    tpu_qps, tpu_idx = bench_tpu(corpus, queries)
    cpu_qps, cpu_idx = bench_cpu_reference(corpus, queries)
    # sanity: same top-k sets (allow order/tie differences)
    overlap = np.mean(
        [len(set(tpu_idx[i]) & set(cpu_idx[i])) / K for i in range(P)]
    )
    result = {
        "metric": "retrieval_qps_per_chip",
        "value": round(tpu_qps, 2),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "detail": {
            "corpus": N,
            "dim": DIM,
            "query_batch": P,
            "k": K,
            "cpu_reference_qps": round(cpu_qps, 2),
            "topk_overlap": round(float(overlap), 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
