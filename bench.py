"""Retrieval throughput benchmark (the BASELINE.json north star).

Measures batched MIPS top-k retrieval QPS on one chip — a probe fan-out of
P queries against an N x d chunk-embedding corpus, fused matmul + top-k —
and compares against the reference's retrieval path (torch-CPU ``mm`` +
``topk`` with batched key tiles, embed_utils.py:8-97 semantics) on the
same data.

The TPU path is *pipelined*, matching how the meta loop actually issues
work (many concurrent probes per iteration, ComoRAG.py:356-358): all
query batches are dispatched async, host copies start eagerly, and the
pipeline is drained once — instead of paying a blocking host↔device
round-trip per call.

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
TPU_ITERS = int(os.environ.get("BENCH_ITERS", 100))
CPU_ITERS = int(os.environ.get("BENCH_CPU_ITERS", 3))


def make_data():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((P, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return corpus, queries


def bench_tpu(corpus, queries, dtype="float32", exact=True):
    """Pipelined QPS + last result; also returns blocking per-call QPS."""
    from comorag_tpu.retrieval.index import MipsIndex

    index = MipsIndex(corpus, dtype=dtype)
    # warmup + compile
    idx_out = index.topk(queries, k=K)[1]

    # pipelined: dispatch everything, then drain; best-of-3 passes (the
    # remote tunnel adds run-to-run noise; CPU baseline gets the same
    # best-of treatment)
    qps_pipe = 0.0
    for _ in range(3):
        start = time.perf_counter()
        results = index.topk_many([queries] * TPU_ITERS, k=K, exact=exact)
        elapsed = time.perf_counter() - start
        qps_pipe = max(qps_pipe, P * TPU_ITERS / elapsed)
    idx_out = results[-1][1]

    # sequential blocking (one sync per call) for reference
    n_block = max(3, TPU_ITERS // 10)
    start = time.perf_counter()
    for _ in range(n_block):
        _, idx_out_b = index.topk(queries, k=K, exact=exact)
    qps_block = P * n_block / (time.perf_counter() - start)
    return qps_pipe, qps_block, idx_out


def bench_cpu_reference(corpus, queries):
    """The reference's device-agnostic retrieval loop (torch mm + topk over
    key batches, two-level top-k merge), running on CPU as it does without
    CUDA."""
    import torch

    q = torch.from_numpy(queries)
    key_batch = 10_000  # synonymy_edge_key_batch_size default
    keys = torch.from_numpy(corpus)

    def one_pass():
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
        return torch.gather(cat_i, 1, pos)

    idx_out = one_pass()  # warmup (thread pool spin-up, page-in)
    # Best (fastest) pass = the most favorable baseline number, i.e. the
    # most conservative reported speedup.
    best = float("inf")
    for _ in range(CPU_ITERS):
        start = time.perf_counter()
        idx_out = one_pass()
        best = min(best, time.perf_counter() - start)
    return P / best, idx_out.numpy()


def overlap(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean([len(set(a[i]) & set(b[i])) / K for i in range(P)]))


def main() -> None:
    corpus, queries = make_data()
    tpu_qps, tpu_qps_block, tpu_idx = bench_tpu(corpus, queries, dtype="float32", exact=True)
    bf16_qps, _, bf16_idx = bench_tpu(corpus, queries, dtype="bfloat16", exact=True)
    int8_qps, _, int8_idx = bench_tpu(corpus, queries, dtype="int8", exact=True)
    cpu_qps, cpu_idx = bench_cpu_reference(corpus, queries)
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
            "tpu_blocking_qps": round(tpu_qps_block, 2),
            "tpu_bf16_pipelined_qps": round(bf16_qps, 2),
            "tpu_int8_pipelined_qps": round(int8_qps, 2),
            "topk_overlap_vs_cpu": round(overlap(tpu_idx, cpu_idx), 4),
            "topk_overlap_bf16_vs_cpu": round(overlap(bf16_idx, cpu_idx), 4),
            "topk_overlap_int8_vs_cpu": round(overlap(int8_idx, cpu_idx), 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
