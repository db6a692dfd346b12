"""Round-2 hardening: timeline meta-artifact validation (ADVICE medium),
timeline statistics artifacts, bounded+locked query-embedding cache, and
the bounded encoder pipeline window."""

import json
import os

import numpy as np

from comorag_tpu.llm.base import BaseLLM, LLMResponse
from comorag_tpu.llm.summarize import Summarizer
from comorag_tpu.models.hash_encoder import HashEncoder
from comorag_tpu.store.embedding_store import EmbeddingStore
from comorag_tpu.timeline.summarizer import TimelineSummarizer


class ConstantLLM(BaseLLM):
    """Returns the SAME summary for every window — triggers content-hash
    dedup in the store, which used to permanently break count-based
    timeline validation."""

    def __init__(self):
        self.calls = 0

    def infer(self, messages, **gen_kwargs) -> LLMResponse:
        self.calls += 1
        return LLMResponse(text="The valley changed.", metadata={}, cache_hit=False)


def _timeline(tmp_path, llm):
    encoder = HashEncoder(dim=32)
    chunks = EmbeddingStore(encoder, str(tmp_path / "chunks"), 8, "chunk")
    chunks.insert_strings([f"Event number {i} happened in the valley." for i in range(6)])
    return TimelineSummarizer(chunks, Summarizer(llm), encoder, str(tmp_path / "tl"), batch_size=8)


class TestTimelineMeta:
    def test_duplicate_summaries_do_not_invalidate(self, tmp_path):
        """Two windows summarizing identically dedup to ONE stored row;
        the meta artifact must still validate (the count heuristic would
        re-fire every LLM call on every run)."""
        llm = ConstantLLM()
        tl = _timeline(tmp_path, llm)
        store = tl.load_or_generate()
        assert len(store) == 1  # deduped
        calls_after_build = llm.calls
        assert calls_after_build > 0

        tl2 = _timeline(tmp_path, llm)
        # fresh chunk store object inserts the same 6 chunks (hash dedup)
        assert tl2.validate(), "meta artifact must mark the timeline as covering the corpus"
        tl2.load_or_generate()
        assert llm.calls == calls_after_build, "reload must not re-summarize"

    def test_meta_detects_grown_corpus(self, tmp_path):
        llm = ConstantLLM()
        tl = _timeline(tmp_path, llm)
        tl.load_or_generate()
        tl.chunk_store.insert_strings([f"Later event {i}." for i in range(24)])
        tl2 = TimelineSummarizer(
            tl.chunk_store, Summarizer(llm), tl.encoder, tl.directory, batch_size=8
        )
        assert not tl2.validate()

    def test_legacy_store_without_meta_upgrades(self, tmp_path):
        llm = ConstantLLM()
        tl = _timeline(tmp_path, llm)
        tl.load_or_generate()
        os.remove(tl._meta_path)
        tl_again = _timeline(tmp_path, ConstantLLM())
        # deduped store (1 row) != expected windows (3) -> regenerate once,
        # which rewrites the meta; never a permanent loop
        assert not tl_again.validate()
        tl_again.load_or_generate()
        assert os.path.exists(tl_again._meta_path)
        assert tl_again.validate()


class TestTimelineStats:
    def test_statistics_artifacts(self, tmp_path):
        from comorag_tpu.llm.fake import FakeLLM

        tl = _timeline(tmp_path, FakeLLM())
        tl.load_or_generate()
        json_path = tl.save_statistics(str(tmp_path / "stats"))
        stats = json.load(open(json_path))
        assert stats["total_levels"] == 1
        lv = stats["levels"][0]
        assert lv["node_count"] == len(tl.level_store(0))
        for field in ("total_tokens", "avg_tokens_per_node", "min_tokens",
                      "max_tokens", "total_chars", "avg_chars_per_node"):
            assert lv[field] > 0
        assert stats["model_info"]["total_chunks"] == 6
        txt = open(os.path.join(tmp_path, "stats", "timeline_stats.txt")).read()
        assert "=== Summary Statistics ===" in txt and "Level 0:" in txt


class TestQueryCacheLRU:
    def _engine(self, tmp_path):
        from comorag_tpu.config import ComoConfig
        from comorag_tpu.retrieval.engine import RetrievalEngine

        encoder = HashEncoder(dim=32)
        store = EmbeddingStore(encoder, str(tmp_path / "chunks"), 8, "chunk")
        store.insert_strings(["alpha beta", "gamma delta"])
        config = ComoConfig(save_dir=str(tmp_path / "o"), embedding_model_name="hash", embedding_dim=32)
        return RetrievalEngine(config, encoder, store)

    def test_cache_bounded(self, tmp_path):
        eng = self._engine(tmp_path)
        eng._query_cache_max = 10
        for i in range(50):
            eng.encode_queries([f"question number {i}"])
        assert len(eng._query_cache) <= 10

    def test_cache_hit_returns_same_embedding(self, tmp_path):
        eng = self._engine(tmp_path)
        a = eng.encode_queries(["who did it?"])
        b = eng.encode_queries(["who did it?"])
        np.testing.assert_array_equal(a["fact"], b["fact"])
        np.testing.assert_array_equal(a["passage"], b["passage"])

    def test_duplicate_queries_encode_once(self, tmp_path):
        eng = self._engine(tmp_path)
        calls = []
        orig = eng.encoder.encode

        def spy(texts, **kw):
            calls.append(list(texts))
            return orig(texts, **kw)

        eng.encoder.encode = spy
        out = eng.encode_queries(["same question", "same question", "same question"])
        assert out["fact"].shape[0] == 3
        assert all(len(batch) == 1 for batch in calls)  # deduped before encoding


class TestEncoderWindow:
    def test_encode_correct_past_window(self):
        """More batches than the pipeline window: output must equal the
        batch-by-batch result (drain path correctness)."""
        from comorag_tpu.models.bge import BGEJaxEncoder, EncoderArch, init_params
        import jax

        arch = EncoderArch.tiny()
        params = init_params(jax.random.PRNGKey(0), arch)
        enc = BGEJaxEncoder(params=params, arch=arch, max_seq_len=16, batch_size=1)
        texts = [f"text number {i}" for i in range(70)]  # 70 batches > window 64
        all_at_once = enc.encode(texts)
        one_by_one = np.concatenate([enc.encode([t]) for t in texts], axis=0)
        np.testing.assert_allclose(all_at_once, one_by_one, atol=1e-5)


class TestDeviceResidentQueries:
    def test_engine_keeps_device_rows_for_device_encoders(self, tmp_path):
        """With a device-side encoder the fan-out's query embeddings never
        bounce through the host: encode_queries returns jax arrays and the
        indexes score them directly (same results as the host path)."""
        import jax

        from comorag_tpu.config import ComoConfig
        from comorag_tpu.models.bge import BGEJaxEncoder, EncoderArch, init_params
        from comorag_tpu.retrieval.engine import RetrievalEngine

        arch = EncoderArch(vocab_size=64, hidden_size=16, num_layers=1,
                           num_heads=2, intermediate_size=32, max_position=32)
        encoder = BGEJaxEncoder(
            params=init_params(jax.random.PRNGKey(0), arch), arch=arch,
            max_seq_len=16, batch_size=4,
        )
        store = EmbeddingStore(encoder, str(tmp_path / "chunks"), 8, "chunk")
        store.insert_strings(["alpha beta gamma", "delta epsilon zeta", "eta theta iota"])
        config = ComoConfig(save_dir=str(tmp_path / "o"),
                            embedding_model_name="bge", embedding_dim=16)
        eng = RetrievalEngine(config, encoder, store)

        embs = eng.encode_queries(["alpha beta?", "delta epsilon?"])
        assert isinstance(embs["passage"], jax.Array)  # stayed on device
        res = eng.tri_retrieve_batch(["alpha beta?", "delta epsilon?"])
        assert len(res) == 2 and all(r.veridical for r in res)

        # device rows score identically to the host-encoded rows
        s_dev = eng.ver_index.scores(embs["passage"][:1])
        # same query text, same instruction space as 'query_to_passage'
        from comorag_tpu.prompts.linking import get_query_instruction
        host_i = encoder.encode(["alpha beta?"],
                                instruction=get_query_instruction("query_to_passage"),
                                norm=True)
        s_host = eng.ver_index.scores(host_i)
        np.testing.assert_allclose(np.asarray(s_dev), s_host, atol=1e-5)


def test_response_cache_key_includes_budget():
    """A 500-token truncated response must never be served to a
    2000-token request: the budget is part of the response identity."""
    from comorag_tpu.llm.openai_client import OpenAIChatLLM

    class SpyClient:
        def __init__(self):
            self.calls = 0

        def post(self, url, json=None, headers=None):
            self.calls += 1
            mt = json["max_tokens"]

            class R:
                @staticmethod
                def raise_for_status():
                    pass

                @staticmethod
                def json():
                    return {
                        "choices": [{"message": {"content": f"resp@{mt}"},
                                     "finish_reason": "stop"}],
                        "usage": {},
                    }

            return R()

    import tempfile

    from comorag_tpu.llm.cache import ResponseCache

    with tempfile.TemporaryDirectory() as td:
        llm = OpenAIChatLLM(model="m", cache_path=td + "/c.sqlite")
        assert isinstance(llm.cache, ResponseCache)
        spy = SpyClient()
        llm._client = spy
        msgs = [{"role": "user", "content": "summarize this"}]
        a = llm.infer(msgs, max_completion_tokens=500)
        b = llm.infer(msgs, max_completion_tokens=2000)
        assert a.text == "resp@500" and b.text == "resp@2000"
        assert spy.calls == 2  # different budgets -> different cache rows
        c = llm.infer(msgs, max_completion_tokens=500)
        assert c.text == "resp@500" and c.cache_hit and spy.calls == 2


def test_permanent_http_errors_do_not_retry():
    """4xx (bad key / invalid request) fails fast instead of burning the
    exponential-backoff budget; the cause chains into the RuntimeError."""
    import pytest

    from comorag_tpu.llm.openai_client import OpenAIChatLLM

    class FourOhOne:
        def __init__(self):
            self.calls = 0

        def post(self, url, json=None, headers=None):
            self.calls += 1

            class Resp:
                status_code = 401

            class E(Exception):
                response = Resp()

            raise E("401 unauthorized")

    llm = OpenAIChatLLM(model="m", max_retries=5)
    spy = FourOhOne()
    llm._client = spy
    with pytest.raises(RuntimeError) as exc:
        llm.infer([{"role": "user", "content": "hi"}])
    assert spy.calls == 1  # no retries on a permanent client error
    assert exc.value.__cause__ is not None


def test_response_cache_concurrent_threads():
    """Per-thread connections: 16 threads reading/writing one cache file
    must neither corrupt rows nor serialize into wrong results."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from comorag_tpu.llm.cache import ResponseCache

    with tempfile.TemporaryDirectory() as td:
        cache = ResponseCache(td + "/c.sqlite")

        def work(i):
            key = f"k{i % 8}"
            cache.put(key, f"v{i % 8}", {"i": i % 8})
            got = cache.get(key)
            assert got is not None and got[0] == f"v{i % 8}"
            return True

        with ThreadPoolExecutor(max_workers=16) as tp:
            assert all(tp.map(work, range(256)))
