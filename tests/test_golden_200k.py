"""200K-token narrative QA golden run (BASELINE configs 2 -> 4).

Hermetic (hash encoder + fake LLM), fixed seed, planted single- and
multi-hop gold facts. Runs the FULL pipeline — index (timeline + semantic
tree + OpenIE graph) and the meta control loop with a forced impasse so
the probe fan-out / fusion / re-retrieval machinery actually executes —
and asserts:

  - retrieval recall@10 of single-hop golds,
  - multi-hop via the LOOP: for chains whose hop-B chunk is invisible to
    the initial retrieval (dense rank ~1000, no bridging graph entity),
    the probe fan-out must surface it (through the episodic/semantic
    layers — the tri-layer memory's whole point),
  - multi-hop via the GRAPH: a chain whose hops share a capitalized vault
    entity must be bridged by OpenIE+PPR in ONE initial tri-retrieve,
  - end-answer EM/F1 through the eval harness (golden floors).

Reference oracle: script/eval_qa.py:239-312. Measured on commit (seed 7):
recall@10 = 1.0, loop-chains surfaced 5/5, graph chain bridged,
multi-hop answered with the landmark 6/6, F1 = 0.61, EM = 0.33.
"""

import json

import numpy as np
import pytest

from comorag_tpu.comorag import ComoRAG
from comorag_tpu.config import ComoConfig
from comorag_tpu.eval.qa_eval import evaluate_directory, extract_final_answer
from comorag_tpu.llm.fake import FakeLLM
from comorag_tpu.retrieval.index import MipsIndex

N_CHUNKS = 2000  # x ~100 tokens/chunk ~= 200K tokens
N_SINGLE = 12
N_MULTI = 6

NAMES = ["Arden", "Brisa", "Corin", "Davet", "Elwyn", "Fiora", "Garrick", "Halla"]
PLACES = ["mill", "harbor", "orchard", "quarry", "archive", "forge", "lighthouse", "granary"]
VAULTS = ["Szorvane", "Quellmire", "Ashentide", "Velgrath", "Umberfall", "Drossinger"]
LANDMARKS = ["Glasswing Tower", "Emberlight Obelisk", "Saltmarsh Beacon",
             "Hollowbrook Arch", "Thornfield Spire", "Winterglass Dome"]

# Varied filler: identical filler in all 2000 chunks makes every chunk's
# sentence-initial capitals ("Traders", "Nothing") mega-hub entities in the
# OpenIE graph and gives all junk chunks identical dense signatures — a
# pathology no real narrative has. Sample 3 distinct sentences per chunk.
FILLER_POOL = [
    " The road was muddy after the long rain and the carts moved slowly past the fences.",
    " Traders argued about grain prices while children chased geese along the ditch.",
    " By evening the lamps were lit and the clerk recorded the day's totals in the ledger.",
    " Nothing unusual was reported to the council and the watch changed at the ninth bell.",
    " A cold wind came off the water and the fishermen mended their nets in silence.",
    " Two oxen pulled the last wagon up the hill before the gates were barred for the night.",
    " Smoke rose from the bakery chimneys while the miller weighed sacks at the scale.",
    " An old dog slept under the porch as rain dripped from the thatched eaves.",
    " Several lanterns bobbed along the quay where the night crew unloaded barrels.",
    " Frost covered the meadow at dawn and the shepherds drove the flock to lower ground.",
]


def _filler(rng) -> str:
    picks = rng.choice(len(FILLER_POOL), size=4, replace=False)
    return "".join(FILLER_POOL[int(p)] for p in picks)


def make_corpus(seed: int = 7):
    rng = np.random.default_rng(seed)
    chunks = []
    for i in range(N_CHUNKS):
        a = NAMES[rng.integers(len(NAMES))]
        b = PLACES[rng.integers(len(PLACES))]
        d = int(rng.integers(1, 365))
        chunks.append(
            f"Record {i}: {a} visited the {b} on day {d} and settled the accounts."
            + _filler(rng)
        )
    qas = []
    slots = rng.choice(N_CHUNKS, size=N_SINGLE + 2 * N_MULTI, replace=False)
    for g in range(N_SINGLE):
        cid = int(slots[g])
        place = PLACES[g % len(PLACES)]
        chunks[cid] = (
            f"Record {cid}: the hidden relic{g:03d} was sealed inside the {place} vault"
            f" by the wandering cartographer Quintessa." + _filler(rng)
        )
        qas.append({
            "question": f"Where was the hidden relic{g:03d} sealed by Quintessa?",
            "answer": [f"sealed inside the {place} vault", f"{place} vault"],
            "gold_cid": cid,
            "kind": "single",
        })
    # lexically distinct templates per pair: sibling gold chains must not
    # crowd each other out of the probe context. Hop-B wording shares no
    # content words with the question, so hop B is invisible to the initial
    # dense retrieval and reachable only through the vault name.
    hop_a_tpl = [
        "the lost scepter{m} is guarded in the ancient {vault} crypt",
        "the jade idol{m} rests within the forgotten {vault} cellar",
        "the bronze tablet{m} is entombed in the silent {vault} catacomb",
        "the opal diadem{m} hangs inside the shadowed {vault} grotto",
        "the silver astrolabe{m} waits in the buried {vault} undercroft",
        "the amber chalice{m} sleeps in the flooded {vault} cistern",
    ]
    hop_b_tpl = [
        "what rises over the {vault} crypt is the {landmark}, a sight every mason praises",
        "what looms over the {vault} cellar is the {landmark}, a sight every carter praises",
        "what towers over the {vault} catacomb is the {landmark}, a sight every scribe praises",
        "what soars over the {vault} grotto is the {landmark}, a sight every warden praises",
        "what climbs over the {vault} undercroft is the {landmark}, a sight every smith praises",
        "what leans over the {vault} cistern is the {landmark}, a sight every gleaner praises",
    ]
    # two rare tokens per question ("lost scepter00", not just "scepter00"):
    # a random-projection encoder's cross-term noise is ~sqrt(Q*D/dim) for Q
    # query x D chunk content words, so a 1-token signal drowns at any
    # realistic dim while a 2-token signal separates cleanly (see dim below)
    treasures = ["lost scepter", "jade idol", "bronze tablet",
                 "opal diadem", "silver astrolabe", "amber chalice"]
    for m in range(N_MULTI):
        cid_a = int(slots[N_SINGLE + 2 * m])
        cid_b = int(slots[N_SINGLE + 2 * m + 1])
        vault, landmark = VAULTS[m], LANDMARKS[m]
        mtok = f"{m:02d}"
        chunks[cid_a] = (
            f"Record {cid_a}: " + hop_a_tpl[m].format(m=mtok, vault=vault)
            + " according to the oldest charts." + _filler(rng)
        )
        # chains 0..N-2: vault LOWERCASE in hop B — invisible to the
        # capitalized-entity NER, so no graph edge bridges A->B and the
        # chain resolves ONLY via the loop's dense vault-name probe (the
        # hash encoder is case-insensitive). Last chain: capitalized, so
        # the OpenIE graph links A->B through the shared vault entity and
        # PPR must surface hop B in the INITIAL retrieval (HippoRAG-style
        # one-shot bridging, ComoRAG.py:1086-1105).
        vault_b = vault if m == N_MULTI - 1 else vault.lower()
        chunks[cid_b] = (
            f"Record {cid_b}: " + hop_b_tpl[m].format(vault=vault_b, landmark=landmark)
            + "." + _filler(rng)
        )
        t_adj, t_noun = treasures[m].split()
        # "Which monument marks..." (not "What stands over...") so the
        # question shares NO words — not even damped function words — with
        # the hop-B template: hop B must stay invisible to the initial
        # retrieval and reachable only through the loop's vault-name probe
        qas.append({
            "question": f"Which monument marks the resting place of the {t_adj} {t_noun}{mtok}?",
            "answer": [landmark],
            "hop2_token": landmark.split()[0],
            "kind": "multi",
        })
    return chunks, qas


@pytest.fixture(scope="module")
def golden_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden200k")
    chunks, qas = make_corpus()

    landmark_for = {q["question"]: q["answer"][0] for q in qas if q["kind"] == "multi"}

    def qa_answer_fn(question, context):
        # the test's QA oracle: a real LLM asked "which monument..." keeps
        # declaring an impasse ('*') while the context names no monument,
        # which drives the meta loop's probe/fan-out/fusion machinery
        # (ComoRAG.py:350-372) until the probe retrieves hop B; once the
        # landmark is in context, answer it. Single-hop falls through to
        # the extractive overlap answer at iteration 0.
        lm = landmark_for.get(question.strip())
        if lm is None:
            return None
        return lm if lm in context else "*"

    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        # 4096, not 256: random-projection crosstalk is ~1/sqrt(dim); the
        # planted signals are 1-2 rare tokens against ~40 filler content
        # words x 2000 chunks, which needs the bigger codebook to separate
        embedding_dim=4096,
        need_cluster=True,
        save_dir=str(tmp / "outputs"),
        output_dir=str(tmp / "results"),
        gmm_max_clusters=12,
        gmm_em_iterations=20,
        max_meta_loop_iterations=2,
    )
    from comorag_tpu.utils import trace

    c0 = trace.summary()["counters"]
    rag = ComoRAG(config, llm=FakeLLM(qa_answer_fn=qa_answer_fn))
    rag.index(chunks)
    queries = [q["question"] for q in qas]
    solutions = rag.try_answer(queries)
    c1 = trace.summary()["counters"]
    # two-pass fallback-rate probe for THIS run (counters are process-wide)
    rag._test_two_pass_counters = {
        k: c1.get(k, 0) - c0.get(k, 0)
        for k in ("two_pass.batches", "two_pass.rescued_batches")
    }

    results = [
        {"idx": i, "question": q["question"], "golden_answers": q["answer"],
         "output": sol.answer}
        for i, (q, sol) in enumerate(zip(qas, solutions))
    ]
    out_dir = tmp / "results"
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "results.json", "w") as f:
        json.dump(results, f)
    return rag, qas, solutions, str(out_dir)


@pytest.mark.slow
class TestGolden200K:
    def test_corpus_is_200k_tokens(self, golden_run):
        rag, qas, solutions, out_dir = golden_run
        total_words = sum(len(t.split()) for t in rag.ver_store.get_all_texts())
        assert total_words > 120_000  # ~1.3 tokens/word => >150K tokens

    def test_tri_layer_stores_built(self, golden_run):
        rag, *_ = golden_run
        assert len(rag.sem_store) > 0 and len(rag.epi_store) > 0
        assert rag.graph is not None and rag.graph.n_arcs > 0

    def test_two_pass_fallback_rate_under_one_percent(self, golden_run):
        """VERDICT r3 #4: fallback-rate probe on a realistic-text-shaped
        corpus. The QA fan-out's ver layer runs dense scoring (the PPR
        prior needs every score), so the two-pass is probed where it
        serves: the direct top-k serving path over the golden chunk
        index. The sound certificate must rescue <1% of batches (here:
        zero — the golden corpus has no sub-residual-step duplicate
        chunks) while every result stays exact vs fp32."""
        rag, qas, *_ = golden_run
        index = rag.engine.ver_index
        assert index.scan_dtype == "int8", "default config lost the two-pass"

        embs = rag.engine.encode_queries([q["question"] for q in qas])["passage"]
        batches = [embs[i : i + 4] for i in range(0, len(embs), 4)]
        handles = [index.topk_async(b, k=10) for b in batches]
        rescued = 0
        for h, b in zip(handles, batches):
            s_tp, i_tp = h.result()
            rows, rescue = h._rescue_state
            rescued += int(rescue is not None)
            ref = MipsIndex(np.asarray(index.corpus)[: index.n], scan_dtype=None)
            s_ref, i_ref = ref.topk(b, k=10)
            for r in range(len(b)):
                assert set(i_tp[r].tolist()) == set(i_ref[r].tolist())
        # indexing also counted its own two-pass batches (synonymy KNN
        # engages when >=1024 entities); fold those into the rate
        counters = rag._test_two_pass_counters
        total = counters["two_pass.batches"] + len(batches)
        total_rescued = counters["two_pass.rescued_batches"] + rescued
        assert total_rescued <= max(1, 0.01 * total), (total, total_rescued)

    def test_single_hop_recall_at_10(self, golden_run):
        rag, qas, solutions, out_dir = golden_run
        singles = [q for q in qas if q["kind"] == "single"]
        res = rag.engine.tri_retrieve_batch([q["question"] for q in singles], ver_top_k=10)
        hits = sum(
            any(f"relic{g:03d}" in d for d in r.veridical[:10])
            for g, r in zip(range(N_SINGLE), res)
        )
        assert hits / N_SINGLE >= 0.9  # measured 1.0

    def test_multi_hop_second_hop_surfaced_by_loop(self, golden_run):
        """Chains 0..N-2: the initial retrieval cannot see hop B (dense rank
        ~1000, no graph edge); only the probe fan-out after the impasse can
        pull it in via the vault name read off hop A."""
        rag, qas, solutions, out_dir = golden_run
        loop_chains = [q for q in qas if q["kind"] == "multi"][:-1]
        surfaced = 0
        for q in loop_chains:
            sol = solutions[qas.index(q)]
            evidence = " ".join(
                str(x) for x in (sol.docs, sol.summary, sol.timeline, sol.answer)
            )
            if q["hop2_token"] in evidence:
                surfaced += 1
        assert surfaced >= len(loop_chains) - 1

    def test_multi_hop_graph_bridges_at_iteration_zero(self, golden_run):
        """Last chain: hop B shares a capitalized vault entity with hop A, so
        the OpenIE graph + PPR must bridge the hop in ONE tri-retrieve —
        no loop needed (dense-only rank of hop B is ~1000)."""
        rag, qas, solutions, out_dir = golden_run
        q = [x for x in qas if x["kind"] == "multi"][-1]
        res = rag.engine.tri_retrieve(q["question"])
        assert any(q["hop2_token"] in d for d in res.veridical)

    def test_answers_scored_by_eval_harness(self, golden_run):
        rag, qas, solutions, out_dir = golden_run
        summary = evaluate_directory(out_dir)
        # golden floors (measured on commit: F1 = 0.61, EM = 0.33 — multi-hop
        # questions answer with the exact landmark once the loop surfaces
        # it; single-hop answers are extractive sentences, so partial F1)
        assert summary["F1"] >= 0.45
        assert summary["ExactMatch"] >= 0.25
        # every answer extracted through the '### Final Answer' protocol
        for sol in solutions:
            assert extract_final_answer(sol.answer) != ""
