"""End-to-end scale benchmark (BASELINE config 3: 10k+ chunk corpus).

Builds a synthetic long-narrative corpus with planted gold facts, runs the
FULL pipeline (index: embed -> timeline -> semantic tree -> OpenIE ->
graph; query: tri-layer retrieval + meta loop) hermetically (hash encoder
+ fake LLM), and reports:

  - index wall time per stage (from the tracing subsystem),
  - retrieval recall@10 of planted gold chunks over Q probe queries,
  - retrieval latency per query batch at corpus scale.

Usage: python scripts/bench_e2e.py [--chunks 10000] [--queries 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comorag_tpu.comorag import ComoRAG
from comorag_tpu.config import ComoConfig
from comorag_tpu.utils import trace

NAMES = [
    "Arden", "Brisa", "Corin", "Davet", "Elwyn", "Fiora", "Garrick", "Halla",
    "Isolde", "Joren", "Kestrel", "Lumen", "Maris", "Nerin", "Orla", "Petra",
]
PLACES = ["mill", "harbor", "orchard", "quarry", "archive", "forge", "lighthouse", "granary"]
ITEMS = ["ledger", "compass", "seedchest", "ironkey", "starchart", "bronzebell", "anvil", "lantern"]


SURNAMES = [
    "Veyl", "Marsh", "Okonkwo", "Ibarra", "Tanaka", "Lindqvist", "Moreau",
    "Castellan", "Drummond", "Ferro", "Galloway", "Hartwell", "Ivers",
    "Jansson", "Kovacs", "Larkspur", "Mendel", "Norcross", "Oakes", "Pryce",
    "Quill", "Rothgar", "Severin", "Thistle", "Underhill", "Vance", "Walden",
    "Xanthe", "Yarrow", "Zephyrin", "Ashdown", "Briarwood",
]


def make_corpus(n: int, n_gold: int, seed: int = 7):
    """Synthetic narrative with a REAL entity graph: full names (first +
    surname pool) give ~|NAMES|x|SURNAMES| distinct proper nouns, and each
    record links two of them, so OpenIE produces a graph whose PPR work
    scales with the corpus instead of collapsing onto 16 hub names."""
    rng = np.random.default_rng(seed)
    chunks = []
    for i in range(n):
        a = f"{NAMES[rng.integers(len(NAMES))]} {SURNAMES[rng.integers(len(SURNAMES))]}"
        a2 = f"{NAMES[rng.integers(len(NAMES))]} {SURNAMES[rng.integers(len(SURNAMES))]}"
        b = PLACES[rng.integers(len(PLACES))]
        c = ITEMS[rng.integers(len(ITEMS))]
        d = int(rng.integers(1, 365))
        chunks.append(
            f"Record {i}: {a} visited the {b} on day {d} with {a2} and catalogued the {c} "
            f"before returning along the river road at dusk."
        )
    golds = []
    gold_ids = rng.choice(n, size=n_gold, replace=False)
    for gi, cid in enumerate(gold_ids):
        token = f"relic{gi:03d}"
        place = PLACES[gi % len(PLACES)]
        chunks[cid] = (
            f"Record {cid}: the hidden {token} was sealed inside the {place} vault "
            f"by the wandering cartographer Quintessa."
        )
        golds.append({"chunk_id": int(cid), "token": token,
                      "query": f"Where was the hidden {token} sealed by Quintessa?"})
    return chunks, golds


# ---------------------------------------------------------------- drift probe
# Fixed-cost tunnel probe (VERDICT r4 #1a): a deterministic fp32 16-query
# microbench measured in slices INTERLEAVED with the QA loop, so the QA
# q/s can be normalized by the same-minute tunnel state instead of moving
# 3x with the weather between runs. PROBE_REFERENCE_QPS pins one
# calibration run (chip + date recorded) — normalized q/s =
# raw * reference/measured, comparable round-over-round.
PROBE_N, PROBE_D, PROBE_P, PROBE_K, PROBE_BATCHES = 50_000, 256, 16, 50, 24
PROBE_REFERENCE_QPS = 10_100.0  # TPU v5e via axon tunnel, 2026-08-19 (r5 calibration)


def make_drift_probe():
    from comorag_tpu.retrieval.index import MipsIndex

    rng = np.random.default_rng(12345)
    corpus = rng.standard_normal((PROBE_N, PROBE_D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    index = MipsIndex(corpus, scan_dtype=None)  # fp32 single-pass, host uploads
    batches = [
        rng.standard_normal((PROBE_P, PROBE_D)).astype(np.float32)
        for _ in range(PROBE_BATCHES)
    ]
    # warm/compile the FULL batch list outside any timing: coalescing
    # gives the full list different group shapes than a short one
    index.topk_many(batches, k=PROBE_K)

    def run() -> float:
        t0 = time.perf_counter()
        index.topk_many(batches, k=PROBE_K)
        return PROBE_P * PROBE_BATCHES / (time.perf_counter() - t0)

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=10_000)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--gmm_max_clusters", type=int, default=20)
    ap.add_argument(
        "--skip_impasse", action="store_true",
        help="skip the forced-impasse phase (it reloads a second ComoRAG "
        "from the persisted stores — minutes at 500k chunks)",
    )
    ap.add_argument(
        "--workdir", default=None,
        help="persistent working dir: reruns reuse the saved index "
        "(stores/graph/OpenIE reload by content hash) instead of paying "
        "the full index wall each measurement iteration",
    )
    ap.add_argument(
        "--platform",
        default=None,
        help="force a JAX platform (e.g. 'cpu'). The env var alone is NOT "
        "enough under the axon plugin — it pins jax_platforms, so a bare "
        "JAX_PLATFORMS=cpu run still dials the (possibly down) TPU tunnel "
        "at the first device_put and blocks forever.",
    )
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    chunks, golds = make_corpus(args.chunks, args.queries)
    tmp = args.workdir or tempfile.mkdtemp(prefix="bench_e2e_")
    os.makedirs(tmp, exist_ok=True)
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=256,
        need_cluster=True,
        save_dir=os.path.join(tmp, "outputs"),
        output_dir=os.path.join(tmp, "results"),
        gmm_max_clusters=args.gmm_max_clusters,
        gmm_em_iterations=30,
        max_meta_loop_iterations=1,
    )
    rag = ComoRAG(config)

    t0 = time.perf_counter()
    rag.index(chunks)
    index_s = time.perf_counter() - t0

    rag.engine.prepare()

    # retrieval recall@10 over the planted queries, batched fan-out
    queries = [g["query"] for g in golds]
    rag.engine.tri_retrieve_batch(queries, ver_top_k=10)  # warmup/compile (same batch bucket)
    t0 = time.perf_counter()
    results = rag.engine.tri_retrieve_batch(queries, ver_top_k=10)
    retrieve_s = time.perf_counter() - t0
    hits = 0
    for g, res in zip(golds, results):
        if any(g["token"] in d for d in res.veridical[:10]):
            hits += 1
    recall = hits / len(golds)

    # full meta-loop serving throughput: questions/s at the reference's
    # concurrency envelope (<=16 threads, ComoRAG.py:436-437), each
    # question running the complete attempt->impasse-free QA path
    n_q = min(32, len(queries))
    # warm at the TIMED question count: the retrieval window merges
    # concurrent calls, so its batch buckets depend on n_q — a 2-question
    # warmup leaves the merged shapes to compile inside the timed run
    rag.try_answer(queries[:n_q])
    probe = make_drift_probe()
    pre_qa = {
        k: (v["total_s"], v["count"]) for k, v in trace.summary()["spans"].items()
    }
    # QA in 16-question slices (the reference's thread envelope, so merge
    # dynamics match a full run) alternating with drift-probe slices
    slice_q = 16
    probe_rates = [probe()]
    qa_s = 0.0
    for at in range(0, n_q, slice_q):
        t0 = time.perf_counter()
        rag.try_answer(queries[at : at + slice_q])
        qa_s += time.perf_counter() - t0
        probe_rates.append(probe())
    probe_med = float(np.median(probe_rates))
    drift_factor = PROBE_REFERENCE_QPS / probe_med if PROBE_REFERENCE_QPS else None
    # retrieve.* attribution for EXACTLY the timed QA loop (warmups,
    # compiles, and the probe's own spans excluded): per-span delta —
    # note the probe adds no retrieve.* spans (it drives MipsIndex raw)
    qa_retrieve_s = {
        k.split(".", 1)[1]: {
            "s": round(v["total_s"] - pre_qa.get(k, (0.0, 0))[0], 4),
            "calls": int(v["count"] - pre_qa.get(k, (0.0, 0))[1]),
        }
        for k, v in trace.summary()["spans"].items()
        if k.startswith("retrieve.")
    }

    # impasse path: force ONE '*' per question so every question pays a
    # probe fan-out + pool fusion round (the loop's expensive branch)
    from comorag_tpu.llm.fake import FakeLLM

    impassed = set()

    def one_impasse(question, context):
        key = question.strip()[:120]
        if key not in impassed:
            impassed.add(key)
            return "*"
        return None

    qa_imp_s = None
    imp_probe_rates: list = []
    imp_spans = {}
    if not args.skip_impasse:
        rag_imp = ComoRAG(config, llm=FakeLLM(qa_answer_fn=one_impasse))
        rag_imp.index(chunks)  # reloads persisted stores
        rag_imp.try_answer(queries[:n_q])
        impassed.clear()
        qa_imp_s = 0.0
        imp_probe_rates.append(probe())
        pre_imp = {
            k: (v["total_s"], v["count"]) for k, v in trace.summary()["spans"].items()
        }
        for at in range(0, n_q, slice_q):
            t0 = time.perf_counter()
            rag_imp.try_answer(queries[at : at + slice_q])
            qa_imp_s += time.perf_counter() - t0
            imp_probe_rates.append(probe())
        imp_spans = {
            k: {
                "s": round(v["total_s"] - pre_imp.get(k, (0.0, 0))[0], 4),
                "calls": int(v["count"] - pre_imp.get(k, (0.0, 0))[1]),
            }
            for k, v in trace.summary()["spans"].items()
            if (k.startswith("retrieve.") or k.startswith("qa.") or k.startswith("pool."))
            and v["count"] - pre_imp.get(k, (0.0, 0))[1] > 0
        }

    summary = trace.summary()
    spans = summary["spans"]
    counters = summary["counters"]
    report = {
        "chunks": args.chunks,
        "queries": len(queries),
        # certificate fallback-rate probe (VERDICT r3 #4): rescued batches
        # should be ~0 on non-degenerate corpora; any nonzero count names
        # the cost the two-pass pays on this corpus
        "two_pass_batches": int(counters.get("two_pass.batches", 0)),
        "two_pass_rescued_batches": int(counters.get("two_pass.rescued_batches", 0)),
        "two_pass_rescued_rows": int(counters.get("two_pass.rescued_rows", 0)),
        "index_wall_s": round(index_s, 2),
        "index_stages_s": {
            k.split(".", 1)[1]: v["total_s"] for k, v in spans.items() if k.startswith("index.")
        },
        "semantic_tree_breakdown_s": {
            k.split(".", 1)[1]: v["total_s"] for k, v in spans.items() if k.startswith("semantic_tree.")
        },
        "graph_breakdown_s": {
            k.split(".", 1)[1]: v["total_s"] for k, v in spans.items() if k.startswith("graph.")
        },
        # cumulative across warmup + QA loops — RELATIVE weights are the
        # signal (which retrieve stage dominates the fan-out), not walls
        "retrieve_breakdown_s": {
            k.split(".", 1)[1]: v["total_s"] for k, v in spans.items() if k.startswith("retrieve.")
        },
        "retrieval_recall_at_10": round(recall, 4),
        "fanout_retrieve_s": round(retrieve_s, 3),
        "fanout_qps": round(len(queries) / retrieve_s, 2),
        # exact attribution for the timed QA loop (delta, no warmup/compile)
        "qa_retrieve_breakdown_s": qa_retrieve_s,
        "qa_loop_questions": n_q,
        "qa_loop_s": round(qa_s, 2),
        "qa_loop_qps": round(n_q / qa_s, 2),
        # drift normalization (VERDICT r4 #1a): probe qps interleaved with
        # the QA slices; normalized = raw * reference/measured, so the
        # row is comparable across tunnel days
        "drift_probe_qps": [round(r, 1) for r in probe_rates],
        "drift_probe_median_qps": round(probe_med, 1),
        "drift_probe_reference_qps": PROBE_REFERENCE_QPS,
        "qa_loop_qps_drift_normalized": (
            round(n_q / qa_s * drift_factor, 2) if drift_factor else None
        ),
        "qa_loop_impasse_qps": round(n_q / qa_imp_s, 2) if qa_imp_s else None,
        "impasse_span_breakdown_s": imp_spans,
        "qa_loop_impasse_qps_drift_normalized": (
            round(
                n_q / qa_imp_s * PROBE_REFERENCE_QPS / float(np.median(imp_probe_rates)), 2
            )
            if qa_imp_s and imp_probe_rates and PROBE_REFERENCE_QPS
            else None
        ),
        "impasse_drift_probe_qps": [round(r, 1) for r in imp_probe_rates],
        "graph": rag.graph.info() if rag.graph else None,
        "stores": {
            "chunks": len(rag.ver_store),
            "entities": len(rag.entity_store),
            "facts": len(rag.fact_store),
            "summaries": len(rag.sem_store) if rag.sem_store else 0,
            "timeline": len(rag.epi_store) if rag.epi_store else 0,
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
