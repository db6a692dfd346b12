"""End-to-end pipeline test: index -> graph -> meta loop -> answers,
hermetic (HashEncoder + FakeLLM), on the CPU mesh. The fixture story is an
original mini-narrative shaped like the bundled smoke-test dataset
(5-ish chunks, a few QA pairs)."""

import json
import os

import numpy as np
import pytest

from comorag_tpu.comorag import ComoRAG
from comorag_tpu.config import ComoConfig

CORPUS = [
    "Mara the lighthouse keeper lived alone on the cliff at Graywater Point. "
    "Every evening she lit the great lamp and wound the brass clockwork that "
    "turned its beam across the bay.",
    "One autumn storm, a trading ship called the Petrel struck the shoals. "
    "Mara rowed out through the breakers and pulled the ship's navigator, a "
    "young man named Tomas, from the freezing water.",
    "Tomas stayed the winter at Graywater Point to mend his broken arm. He "
    "taught Mara to read the old star charts he carried in a sealed copper tube.",
    "In spring, a letter arrived from the Harbor Guild. The Guild offered "
    "Mara a post as chart-mistress in the city, because Tomas had written to "
    "them about her skill with the star charts.",
    "Mara refused the Guild's offer. She chose to stay at the lighthouse, and "
    "Tomas returned each summer with new charts, apprenticing under her until "
    "he could keep the lamp himself.",
    "Years later the brass clockwork finally failed. Tomas forged a new "
    "mainspring in the village smithy, and the beam of Graywater Point never "
    "went dark again.",
]

QAS = [
    {"question": "Who did Mara pull from the freezing water?", "golden_answers": ["Tomas", "the navigator"]},
    {"question": "What did the Harbor Guild offer Mara?", "golden_answers": ["a post as chart-mistress"]},
    {"question": "What did Tomas forge in the village smithy?", "golden_answers": ["a new mainspring", "mainspring"]},
]


@pytest.fixture(scope="module")
def rag(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=128,
        need_cluster=True,
        save_dir=str(tmp / "outputs"),
        output_dir=str(tmp / "results"),
        max_meta_loop_iterations=2,
        gmm_max_clusters=4,
        gmm_em_iterations=20,
    )
    rag = ComoRAG(config)
    rag.index(CORPUS)
    return rag


def test_index_builds_all_layers(rag):
    assert len(rag.ver_store) == len(CORPUS)
    assert len(rag.entity_store) > 0
    assert len(rag.fact_store) > 0
    assert rag.epi_store is not None and len(rag.epi_store) > 0
    assert len(rag.sem_store) > 0
    assert rag.graph is not None and rag.graph.n_arcs > 0
    # persistence artifacts on disk
    wd = rag.config.working_dir
    assert os.path.exists(os.path.join(wd, "chunk_embeddings", "vdb_chunk.parquet"))
    assert os.path.exists(os.path.join(wd, "graph.npz"))
    assert os.path.isfile(rag.openie_results_path)


def test_graph_census_hand_built():
    """VERDICT r3 #5: get_graph_info parity — the census of a hand-built
    toy graph must match counts computable by hand."""
    from comorag_tpu.graph.builder import GraphBuilder

    b = GraphBuilder()
    # 2 chunks; chunk A has triples (x, r, y) twice and (y, r, z);
    # chunk B has (x, r, z). Unique triples (fact-store rows) = 3.
    ents = {n: b._entity_key(n) for n in ("x", "y", "z")}
    b.add_fact_edges(
        ["chunk-A", "chunk-B"],
        [[("x", "r", "y"), ("x", "r", "y"), ("y", "r", "z")], [("x", "r", "z")]],
    )
    b.add_passage_edges(["chunk-A", "chunk-B"], [["x", "y", "z"], ["x", "z"]])
    # synonymy: two clearly-identical embeddings among three entities
    embs = np.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
    n_syn = b.add_synonymy_edges(
        [ents["x"], ents["y"], ents["z"]], ["xxx", "yyy", "zzz"], embs
    )
    assert n_syn == 2  # x<->y both directions

    node_names = list(ents.values()) + ["chunk-A", "chunk-B", "sum-1"]
    census = b.census(
        node_names,
        passage_keys=["chunk-A", "chunk-B"],
        summary_keys=["sum-1"],
        num_extracted_triples=3,
    )
    assert census == {
        "num_phrase_nodes": 3,
        "num_passage_nodes": 2,
        "num_summary_nodes": 1,
        "num_total_nodes": 6,
        # 2 chunks x their contained entities: 3 + 2 entries
        "num_triples_with_passage_node": 5,
        # fact pairs double-entered: (x,y),(y,x),(y,z),(z,y),(x,z),(z,x)=6;
        # synonymy (x,y),(y,x) overwrite existing fact entries -> total
        # stats = 6 + 5 passage = 11
        "num_total_triples": 11,
        "num_synonymy_triples": 2,
        "num_extracted_triples": 3,
    }

    g = b.finalize(node_names)
    info = g.info()
    assert info["num_nodes"] == 6
    # every stats entry except self-loops becomes a symmetric arc pair
    assert info["num_arcs"] == 22
    assert info["avg_degree"] == pytest.approx(22 / 6, abs=1e-3)


def test_graph_census_persisted_and_traced(rag):
    """The indexed pipeline attaches the census to the graph, persists it
    through save/load, and surfaces it as trace gauges."""
    from comorag_tpu.graph.builder import GraphData
    from comorag_tpu.utils import trace

    census = rag.graph.census
    assert census["num_passage_nodes"] == len(CORPUS)
    assert census["num_phrase_nodes"] == len(rag.entity_store)
    assert census["num_summary_nodes"] == len(rag.sem_store)
    assert census["num_extracted_triples"] == len(rag.fact_store)
    # every stats entry materializes at most one symmetric arc pair
    # (self-loops / unknown endpoints drop), so total >= arcs / 2
    assert census["num_total_triples"] >= rag.graph.n_arcs // 2
    reloaded = GraphData.load(rag._graph_prefix)
    assert reloaded.census == census
    gauges = trace.summary()["gauges"]
    assert gauges.get("graph.census.num_passage_nodes") == len(CORPUS)


def test_tri_retrieve_layers(rag):
    result = rag.engine.tri_retrieve("Who repaired the clockwork mainspring?")
    assert len(result.veridical) > 0
    assert len(result.episodic) > 0
    # chunk about the mainspring should rank into the veridical list
    assert any("mainspring" in d for d in result.veridical)


def test_meta_loop_answers(rag):
    solutions = rag.try_answer([q["question"] for q in QAS])
    assert len(solutions) == len(QAS)
    for sol in solutions:
        assert sol.answer and "### Final Answer" in sol.answer
    # the overlap-answer FakeLLM should find the mainspring sentence
    forge_answer = solutions[2].answer.split("### Final Answer")[1]
    assert "mainspring" in forge_answer or "smithy" in forge_answer
    # detail dumps exist
    details = os.path.join(rag.config.output_dir, "details")
    assert os.path.exists(os.path.join(details, "pool_info_0.json"))
    assert os.path.exists(os.path.join(details, "qa_output_0.txt"))


def test_index_resume_is_idempotent(rag, monkeypatch):
    # Re-indexing the same docs must not duplicate anything (content hashes)
    # — and must not REBUILD the graph (the warm-index path at 200k chunks
    # pays ~96 s of synonymy KNN without the fingerprint skip).
    from comorag_tpu.graph import builder as builder_mod

    def boom(*a, **k):
        raise AssertionError("graph rebuilt on an unchanged corpus")

    monkeypatch.setattr(builder_mod.GraphBuilder, "add_fact_edges", boom)
    n_chunks = len(rag.ver_store)
    n_facts = len(rag.fact_store)
    n_arcs = rag.graph.n_arcs
    rag.index(CORPUS)
    assert len(rag.ver_store) == n_chunks
    assert len(rag.fact_store) == n_facts
    assert rag.graph.n_arcs == n_arcs


def test_graph_skip_requires_artifact_signature(tmp_path):
    """A torn graph save (new .npz beside an old .json — two files, crash
    between them) must NOT be skipped over: the meta's signature binds the
    fingerprint to the artifact, so a mismatched pairing rebuilds instead
    of running PPR on a wrong node numbering."""
    import json as _json

    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=128,
        save_dir=str(tmp_path / "outputs"),
        output_dir=str(tmp_path / "results"),
    )
    rag = ComoRAG(config)
    rag.index(CORPUS)
    prefix = rag._graph_prefix
    with open(prefix + ".json", encoding="utf-8") as f:
        good = _json.load(f)
    tampered = dict(good)
    tampered["node_names"] = list(reversed(good["node_names"]))
    with open(prefix + ".json", "w", encoding="utf-8") as f:
        _json.dump(tampered, f)

    rag2 = ComoRAG(ComoConfig(**{**config.to_dict()}))
    rag2.index(CORPUS)  # fingerprint matches, signature must not -> rebuild
    with open(prefix + ".json", encoding="utf-8") as f:
        restored = _json.load(f)
    assert restored["node_names"] == good["node_names"]


def test_index_graph_rebuilds_on_corpus_change(tmp_path):
    """A grown corpus fails the graph fingerprint and rebuilds."""
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=128,
        save_dir=str(tmp_path / "outputs"),
        output_dir=str(tmp_path / "results"),
    )
    rag = ComoRAG(config)
    rag.index(CORPUS)
    nodes_before = rag.graph.n_nodes
    rag.index(CORPUS + ["Newly arrived: Captain Wren docked the Petrel at dawn."])
    assert len(rag.ver_store) == len(CORPUS) + 1
    assert rag.graph.n_nodes > nodes_before


def test_reload_from_disk(rag):
    config2 = ComoConfig(**{**rag.config.to_dict()})
    rag2 = ComoRAG(config2)
    assert len(rag2.ver_store) == len(CORPUS)
    assert rag2.graph is not None
    assert rag2.graph.n_nodes == rag.graph.n_nodes
    result = rag2.engine.tri_retrieve("Who taught Mara to read star charts?")
    assert any("star charts" in d for d in result.veridical)


def test_tri_retrieve_batch_matches_single(rag):
    """The batched probe fan-out must return exactly what per-probe calls
    return (one device call per layer + one batched PPR vs N sequential)."""
    probes = [
        "Who did Mara pull from the freezing water?",
        "What did the Harbor Guild offer Mara?",
        "What did Tomas forge in the village smithy?",
    ]
    batched = rag.engine.tri_retrieve_batch(probes)
    for probe, got in zip(probes, batched):
        single = rag.engine.tri_retrieve(probe)
        assert got.veridical == single.veridical
        assert got.semantic == single.semantic
        assert got.episodic == single.episodic


def test_multiple_choice_path(tmp_path):
    """is_mc=True routes through rag_qa_mc / rag_qa_mc_memory templates."""
    from comorag_tpu.comorag import ComoRAG
    from comorag_tpu.config import ComoConfig
    from comorag_tpu.llm.fake import FakeLLM

    llm = FakeLLM(qa_answer_fn=lambda q, ctx: "B" if "color" in q else None)
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=64,
        need_cluster=False,
        skip_graph=True,
        is_mc=True,
        save_dir=str(tmp_path / "o"),
        output_dir=str(tmp_path / "r"),
        max_meta_loop_iterations=1,
    )
    rag = ComoRAG(config, llm=llm)
    rag.index(["The banner over the gate was dyed deep crimson for the festival."])
    sols = rag.try_answer(["What color was the banner? A) blue B) crimson C) white"])
    assert "B" in sols[0].answer
    assert llm.calls, "no LLM calls recorded"


def test_sixteen_concurrent_questions(rag):
    """try_answer's 16-thread fan-out over a shared engine/encoder: every
    question returns, no cross-thread corruption (answers match the
    single-threaded result)."""
    questions = [
        "Who did Mara pull from the freezing water?",
        "What did the Harbor Guild offer Mara?",
        "What did Tomas forge in the village smithy?",
        "Who taught Mara to read the star charts?",
    ] * 4  # 16 questions, 4 distinct
    sols = rag.try_answer(questions)
    assert len(sols) == 16
    by_q = {}
    for q, s in zip(questions, sols):
        by_q.setdefault(q, set()).add(s.answer)
    # identical questions must produce identical answers across threads
    assert all(len(v) == 1 for v in by_q.values()), by_q


def test_fused_device_route_matches_host_route(rag):
    """Forcing the fused device PPR route (sparse seeds + device prior +
    on-device top-k) must return the same veridical ranking as the
    host/native route the small-graph crossover normally picks."""
    probes = [
        "Who did Mara pull from the freezing water?",
        "What did Tomas forge in the village smithy?",
    ]
    baseline = rag.engine.tri_retrieve_batch(probes)
    ppr = rag.engine.ppr
    orig = ppr.routes_device
    try:
        ppr.routes_device = lambda b: True  # force the fused branch
        fused = rag.engine.tri_retrieve_batch(probes)
    finally:
        ppr.routes_device = orig
    for base, got in zip(baseline, fused):
        assert got.veridical == base.veridical
        assert got.linked_phrases.keys() == base.linked_phrases.keys()


def test_fused_route_never_downloads_dense_scores(rag):
    """On the fused device route the fan-out must consume ONLY the compact
    stats transfer — the dense [B, N] DPR matrix (51 MB per fan-out at
    200k chunks) stays on device. result() raising proves no code path
    touches it."""
    from comorag_tpu.retrieval import index as index_mod

    probes = [
        "Who did Mara pull from the freezing water?",
        "What did Tomas forge in the village smithy?",
    ]
    ppr = rag.engine.ppr
    orig_route = ppr.routes_device
    orig_result = index_mod.ScoresStatsHandle.result

    def boom(self):
        raise AssertionError("dense DPR matrix downloaded on the fused route")

    try:
        ppr.routes_device = lambda b: True
        index_mod.ScoresStatsHandle.result = boom
        got = rag.engine.tri_retrieve_batch(probes)
    finally:
        ppr.routes_device = orig_route
        index_mod.ScoresStatsHandle.result = orig_result
    assert all(r.veridical for r in got)


def test_compact_fact_fetch_matches_full_scores(rag):
    """The fused top-k+min fact fetch (one tiny transfer) must produce the
    same linking, ranking, and rerank logs as downloading the full
    [B, F] fact-score matrix."""
    probes = [
        "Who did Mara pull from the freezing water?",
        "What did the Harbor Guild offer Mara?",
    ]
    compact = rag.engine.tri_retrieve_batch(probes)
    rag.engine._use_fact_compact = False
    try:
        full = rag.engine.tri_retrieve_batch(probes)
    finally:
        rag.engine._use_fact_compact = True
    for c, f in zip(compact, full):
        assert c.veridical == f.veridical
        assert c.linked_phrases.keys() == f.linked_phrases.keys()
        for k in c.linked_phrases:
            assert abs(c.linked_phrases[k] - f.linked_phrases[k]) < 1e-5
        assert c.rerank_log["facts_after_rerank"] == f.rerank_log["facts_after_rerank"]


def test_retrieval_window_coalesces_and_matches(rag):
    """r3 RetrievalWindow: concurrent per-question retrievals merge into
    shared engine batches AND return exactly what direct calls return."""
    from concurrent.futures import ThreadPoolExecutor

    from comorag_tpu.retrieval.engine import RetrievalWindow

    engine = rag.engine
    engine.prepare()
    queries = [
        "Who did Mara pull from the freezing water?",
        "What did the Harbor Guild offer Mara?",
        "What did Tomas forge in the village smithy?",
        "Who taught Mara to read the star charts?",
    ]
    direct = [engine.tri_retrieve(q) for q in queries]

    calls = []
    orig = engine.tri_retrieve_batch

    def counting(qs, *a, **k):
        calls.append(len(qs))
        return orig(qs, *a, **k)

    engine.tri_retrieve_batch = counting
    try:
        with RetrievalWindow(engine, window_ms=250.0) as win:
            with ThreadPoolExecutor(max_workers=4) as tp:
                futs = [tp.submit(win.tri_retrieve, q) for q in queries]
                got = [f.result() for f in futs]
    finally:
        engine.tri_retrieve_batch = orig

    for d, g in zip(direct, got):
        assert d.veridical == g.veridical
        assert d.semantic == g.semantic
        assert d.episodic == g.episodic
    assert sum(calls) == len(queries)
    assert len(calls) < len(queries), f"no coalescing happened: {calls}"


def test_impasse_sentinel_spellings():
    """The prompt says write exactly \"*\" (quoted) — realistic sentinel
    spellings must register as an impasse; real answers must not."""
    from comorag_tpu.comorag import ComoRAG

    for yes in ("*", '"*"', "*.", "**", ": *", " '*' "):
        assert ComoRAG._is_impasse(yes), yes
    for no in ("Paris", "", '"answer"', "*bold* text", ":", "a * b"):
        assert not ComoRAG._is_impasse(no), no


def test_empty_llm_response_retries(tmp_path):
    """An empty LLM response (null API content, isolated batch error) must
    consume a retry iteration, not be accepted as the final answer."""
    from comorag_tpu.llm.base import LLMResponse
    from comorag_tpu.llm.fake import FakeLLM

    class BlankFirst(FakeLLM):
        def __init__(self):
            super().__init__()
            self.blanks = 0

        def infer(self, messages, **kw):
            user = [m["content"] for m in messages if m["role"] == "user"][-1]
            if "Question:" in user and self.blanks == 0:
                self.blanks += 1
                return LLMResponse(text="")
            return super().infer(messages, **kw)

    config = ComoConfig(
        llm_name="fake", embedding_model_name="hash", embedding_dim=128,
        save_dir=str(tmp_path / "o"), output_dir=str(tmp_path / "r"),
    )
    llm = BlankFirst()
    rag = ComoRAG(config, llm=llm)
    rag.index(CORPUS)
    sol = rag.try_answer(["Who did Mara pull from the freezing water?"])[0]
    assert llm.blanks == 1  # the blank response happened...
    assert sol.answer and "### Final Answer" in sol.answer  # ...and was retried


def test_one_question_failure_does_not_discard_the_batch(rag):
    """A question whose meta loop raises must yield an empty-answer
    solution in ITS slot; every other question's result survives and the
    returned list stays positionally aligned with the queries."""
    orig = rag.meta_control_loop

    def flaky(q_idx, query):
        if "poison" in query:
            raise RuntimeError("boom")
        return orig(q_idx, query)

    rag.meta_control_loop = flaky
    try:
        sols = rag.try_answer([
            "Who did Mara pull from the freezing water?",
            "a poison question",
            "What did Tomas forge in the village smithy?",
        ])
    finally:
        del rag.meta_control_loop
    assert len(sols) == 3
    assert sols[1].question == "a poison question" and sols[1].answer == ""
    assert sols[0].answer and "### Final Answer" in sols[0].answer
    assert sols[2].answer and "### Final Answer" in sols[2].answer


def test_qa_layer_budgets_scale_to_window(tmp_path):
    """ver+sem+epi context budgets must scale under the engine window —
    an over-window prompt is LEFT-truncated, silently cutting the system
    prompt and the '*' protocol instructions off the front."""
    class WindowedFake:
        max_model_len = 2048

        def infer(self, messages, **kw):
            from comorag_tpu.llm.base import LLMResponse

            return LLMResponse(text="x")

    config = ComoConfig(
        llm_name="fake", embedding_model_name="hash", embedding_dim=64,
        save_dir=str(tmp_path / "o"), output_dir=str(tmp_path / "r"),
    )
    rag = ComoRAG(config, llm=WindowedFake())
    b = rag._qa_layer_budgets()
    assert sum(b) <= 2048 - config.qa_max_completion_tokens - 1024
    assert b[0] > b[1] == b[2]  # proportions preserved
    # no window -> untouched defaults
    rag2 = ComoRAG(ComoConfig(
        llm_name="fake", embedding_model_name="hash", embedding_dim=64,
        save_dir=str(tmp_path / "o2"), output_dir=str(tmp_path / "r2"),
    ))
    assert rag2._qa_layer_budgets() == (3000, 1000, 1000)


def test_window_group_failure_is_isolated():
    """One poison request in a merged window group must fail ONLY its own
    future — the others retry individually and succeed (pre-window, a
    failure was confined to its question thread)."""
    from concurrent.futures import ThreadPoolExecutor

    import pytest

    from comorag_tpu.retrieval.engine import RetrievalWindow

    class FlakyEngine:
        def tri_retrieve_batch(self, queries, **kw):
            if any("poison" in q for q in queries):
                raise RuntimeError("poison row")
            return [f"ok:{q}" for q in queries]

    with RetrievalWindow(FlakyEngine(), window_ms=150.0) as win:
        with ThreadPoolExecutor(max_workers=3) as tp:
            f1 = tp.submit(win.tri_retrieve, "good one")
            f2 = tp.submit(win.tri_retrieve, "poison here")
            f3 = tp.submit(win.tri_retrieve, "good two")
            assert f1.result(timeout=30) == "ok:good one"
            assert f3.result(timeout=30) == "ok:good two"
            with pytest.raises(RuntimeError, match="poison"):
                f2.result(timeout=30)


def test_window_bounds_merged_rows():
    """A burst must not snowball into one unbounded device batch: drained
    merges respect max_rows at request boundaries."""
    from comorag_tpu.retrieval.engine import RetrievalWindow

    calls = []

    class Eng:
        def tri_retrieve_batch(self, queries, **kw):
            calls.append(len(queries))
            return ["r"] * len(queries)

    with RetrievalWindow(Eng(), window_ms=60.0, max_rows=16) as win:
        futs = [win.submit([f"q{i}-{j}" for j in range(10)]) for i in range(10)]
        outs = [f.result(timeout=30) for f in futs]
    assert all(len(o) == 10 for o in outs)
    assert sum(calls) == 100
    assert max(calls) <= 16


def test_fanout_batches_fact_rerank(rag):
    """The batched fan-out must issue ONE rerank_batch call for all rows
    (the window scheduler is single-threaded: per-row infer calls would
    serialize generations that used to overlap across question threads)."""
    engine = rag.engine
    engine.prepare()
    calls = []
    orig = engine.fact_filter.rerank_batch

    def spy(queries, items_rows, idx_rows, k=None):
        calls.append(len(queries))
        return orig(queries, items_rows, idx_rows, k)

    engine.fact_filter.rerank_batch = spy
    try:
        engine.tri_retrieve_batch([
            "Who did Mara pull from the freezing water?",
            "What did Tomas forge in the village smithy?",
            "Who taught Mara to read the star charts?",
        ])
    finally:
        engine.fact_filter.rerank_batch = orig
    assert calls == [3]


def test_explicit_zero_top_k_disables_layer(rag):
    """top_k=0 must retrieve nothing from that layer, not balloon to the
    config default (falsy-or bug class, ADVICE r2)."""
    engine = rag.engine
    engine.prepare()
    res = engine.tri_retrieve("Who did Mara pull from the freezing water?", ver_top_k=0)
    assert res.veridical == []


def test_per_row_pool_filters(rag):
    """pool_hashes_rows: each merged row applies its OWN pool dedup."""
    from comorag_tpu.utils.hashing import content_hash

    engine = rag.engine
    engine.prepare()
    q = "Who did Mara pull from the freezing water?"
    base = engine.tri_retrieve_batch([q, q])
    assert base[0].veridical == base[1].veridical
    top_doc = base[0].veridical[0]
    ph = {"veridical": [content_hash(top_doc, "veridical-")]}
    out = engine.tri_retrieve_batch([q, q], pool_hashes_rows=[ph, None])
    assert top_doc not in out[0].veridical
    assert top_doc in out[1].veridical
