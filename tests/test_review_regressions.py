"""Regression tests for defects found in code review (round 1)."""

import numpy as np
import pytest

from comorag_tpu.retrieval.index import MipsIndex


class TestShardedTopkLargeK:
    def test_k_exceeds_shard_rows(self, cpu_mesh):
        """synonymy_edge_topk=2047-style requests: k larger than one
        shard's rows must still return the exact global top-k."""
        rng = np.random.default_rng(0)
        n, d, k = 4096, 32, 2047  # 8 shards x 512 rows; k >> 512
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((3, d)).astype(np.float32)
        sharded = MipsIndex(corpus, mesh=cpu_mesh)
        assert sharded.mesh is not None
        s, i = sharded.topk(q, k=k)
        ref = np.argsort(-(q @ corpus.T), axis=1)[:, :k]
        assert (i == ref).all()


class TestPhraseWeights:
    def _engine(self, tmp_path):
        from comorag_tpu.comorag import ComoRAG
        from comorag_tpu.config import ComoConfig

        config = ComoConfig(
            llm_name="fake",
            embedding_model_name="hash",
            embedding_dim=64,
            need_cluster=False,
            save_dir=str(tmp_path / "o"),
            output_dir=str(tmp_path / "r"),
        )
        rag = ComoRAG(config)
        rag.index(
            [
                "Alden sailed the brig to Port Vance carrying salt.",
                "Cora bought the salt from Alden at the Vance market.",
                "The market burned when lightning struck the salt warehouse.",
            ]
        )
        rag.engine.prepare()
        return rag.engine

    def test_multiple_phrases_seed_ppr(self, tmp_path):
        """More than one top phrase must receive weight (the buggy version
        returned after the first)."""
        eng = self._engine(tmp_path)
        embs = eng.encode_queries(["Who bought the salt from Alden?"])
        score_row = eng.fact_scores(embs["fact"])[0]
        top_idx, top_facts, _ = eng.rerank_facts("Who bought the salt from Alden?", score_row)
        assert len(top_facts) >= 2
        weights, used = eng._phrase_weights(score_row, top_facts, top_idx)
        assert weights is not None
        assert np.count_nonzero(weights) >= 2, used

    def test_returns_tuple_when_nothing_matches(self, tmp_path):
        """Facts whose phrases aren't graph nodes: still a (weights, used)
        tuple, never None."""
        eng = self._engine(tmp_path)
        fake_facts = [("zzzz", "rel", "qqqq")]
        out = eng._phrase_weights(np.asarray([0.5]), fake_facts, [0])
        assert out is not None
        weights, used = out
        assert np.count_nonzero(weights) == 0 and used == {}


class TestTimelineStaleness:
    def test_grown_corpus_regenerates(self, tmp_path):
        from comorag_tpu.llm.fake import FakeLLM
        from comorag_tpu.llm.summarize import Summarizer
        from comorag_tpu.models.hash_encoder import HashEncoder
        from comorag_tpu.store.embedding_store import EmbeddingStore
        from comorag_tpu.timeline.summarizer import TimelineSummarizer

        encoder = HashEncoder(dim=32)
        chunks = EmbeddingStore(encoder, str(tmp_path / "chunks"), 8, "chunk")
        chunks.insert_strings([f"Event number {i} happened in the valley." for i in range(6)])
        summarizer = Summarizer(FakeLLM())
        tl = TimelineSummarizer(chunks, summarizer, encoder, str(tmp_path / "tl"), batch_size=8)
        store1 = tl.load_or_generate()
        n1 = len(store1)
        assert n1 > 0

        # grow the corpus 5x: the old timeline no longer covers it
        chunks.insert_strings([f"Later event {i} reshaped the valley." for i in range(24)])
        tl2 = TimelineSummarizer(chunks, summarizer, encoder, str(tmp_path / "tl"), batch_size=8)
        assert not tl2.validate()
        store2 = tl2.load_or_generate()
        assert len(store2) == tl2.expected_summaries(30)


class TestGoldAnswers:
    def test_list_aliases_do_not_crash(self):
        from comorag_tpu.cli.run import gold_answers_of

        sample = {
            "obj": "Paris",
            "possible_answers": ["Paris, France", "the French capital"],
            "o_aliases": ["Ville Lumiere"],
        }
        golds = gold_answers_of(sample)
        assert "Paris" in golds and "Ville Lumiere" in golds and len(golds) == 4


class TestSemanticTreeStaleness:
    def test_grown_corpus_rebuilds_tree(self, tmp_path):
        from comorag_tpu.comorag import ComoRAG
        from comorag_tpu.config import ComoConfig

        config = ComoConfig(
            llm_name="fake",
            embedding_model_name="hash",
            embedding_dim=64,
            need_cluster=True,
            skip_graph=True,
            save_dir=str(tmp_path / "o"),
            output_dir=str(tmp_path / "r"),
            gmm_max_clusters=3,
            gmm_em_iterations=10,
        )
        docs = [f"Chapter {i}: the caravan crossed dune {i} at dawn." for i in range(4)]
        rag = ComoRAG(config)
        rag.index(docs)
        n_before = len(rag.sem_store)
        assert n_before > 0

        # same corpus -> reuse (no rebuild)
        rag2 = ComoRAG(config)
        rag2.index(docs)
        assert len(rag2.sem_store) == n_before

        # grown corpus -> rebuild over all chunks
        more = docs + [f"Chapter {i}: a storm scattered caravan {i} at dusk." for i in range(4, 16)]
        rag3 = ComoRAG(config)
        rag3.index(more)
        assert len(rag3.ver_store) == 16
        import json, os
        meta = json.load(open(os.path.join(config.working_dir, "semantic_tree_meta.json")))
        assert meta["n_chunks"] == 16
