"""Coverage for paths not exercised by the main e2e flows: the offline
OpenIE pre-pass, the remote encoder's batching/normalization (mocked
HTTP), and the approximate top-k path."""

import json

import numpy as np
import pytest

from comorag_tpu.retrieval.index import MipsIndex


class TestPreOpenIE:
    def test_two_phase_index(self, tmp_path):
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
        docs = ["Rin mapped the glacier.", "The glacier calved into the fjord."]
        rag = ComoRAG(config)
        n = rag.pre_openie(docs)
        assert n == 2
        # artifact persisted; a second phase reuses it without new LLM calls
        rag2 = ComoRAG(config, llm=_CountingFake())
        rag2.index(docs)
        assert rag2.llm.openie_calls == 0, "phase 2 re-ran OpenIE instead of loading the artifact"
        assert rag2.graph is not None and rag2.graph.n_nodes > 0

    def test_offline_mode_in_index(self, tmp_path):
        from comorag_tpu.comorag import ComoRAG
        from comorag_tpu.config import ComoConfig

        config = ComoConfig(
            llm_name="fake",
            embedding_model_name="hash",
            embedding_dim=64,
            need_cluster=False,
            openie_mode="offline",
            save_dir=str(tmp_path / "o2"),
            output_dir=str(tmp_path / "r2"),
        )
        rag = ComoRAG(config)
        rag.index(["A lone beacon stood on the northern shore."])
        assert rag.engine.tri_retrieve("Where did the beacon stand?").veridical


class _CountingFake:
    """FakeLLM wrapper counting OpenIE-shaped calls."""

    def __init__(self):
        from comorag_tpu.llm.fake import FakeLLM

        self._inner = FakeLLM()
        self.openie_calls = 0

    def infer(self, messages, **kw):
        system = next((m["content"] for m in messages if m["role"] == "system"), "").lower()
        if "named entities" in system or "rdf" in system:
            self.openie_calls += 1
        return self._inner.infer(messages, **kw)

    def batch_infer(self, batch, **kw):
        return [self.infer(m, **kw) for m in batch]


class TestRemoteEncoder:
    def test_batching_and_normalization(self, monkeypatch):
        from comorag_tpu.models.remote import RemoteEncoder

        enc = RemoteEncoder(model="text-embedding-3-small", batch_size=2)
        calls = []

        def fake_post(texts):
            calls.append(list(texts))
            return [[float(len(t)), 1.0, 0.0] for t in texts]

        monkeypatch.setattr(enc, "_post", fake_post)
        out = enc.encode(["a", "bb", "ccc", ""], instruction="Q: ", norm=True)
        assert out.shape == (4, 3)
        assert len(calls) == 2 and all(len(c) == 2 for c in calls)
        # instruction prefix applied; empty text replaced with a space
        assert calls[0][0] == "Q: a" and calls[1][1] == "Q: "
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


class TestApproxTopk:
    def test_recall_against_exact(self):
        rng = np.random.default_rng(0)
        corpus = rng.standard_normal((4096, 64)).astype(np.float32)
        q = rng.standard_normal((8, 64)).astype(np.float32)
        index = MipsIndex(corpus)
        _, exact_idx = index.topk(q, k=32, exact=True)
        _, approx_idx = index.topk(q, k=32, exact=False)
        recall = np.mean(
            [len(set(exact_idx[i]) & set(approx_idx[i])) / 32 for i in range(8)]
        )
        assert recall >= 0.9, recall
