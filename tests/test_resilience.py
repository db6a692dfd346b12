"""Failure-injection tests (SURVEY.md §5: the reference's only resilience
is retries + step-level error capture; we verify ours actually holds)."""

import numpy as np
import pytest

from comorag_tpu.comorag import ComoRAG
from comorag_tpu.config import ComoConfig
from comorag_tpu.llm.fake import FakeLLM


class FlakyLLM(FakeLLM):
    """Fails every Nth call with a transport-style error."""

    def __init__(self, fail_every: int = 3):
        super().__init__()
        self._n = 0
        self.fail_every = fail_every
        self.failures = 0

    def infer(self, messages, **gen_kwargs):
        self._n += 1
        if self._n % self.fail_every == 0:
            self.failures += 1
            raise ConnectionError("injected transport failure")
        return super().infer(messages, **gen_kwargs)


@pytest.fixture()
def flaky_rag(tmp_path):
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=64,
        need_cluster=False,  # summaries would amplify injected failures
        skip_graph=True,
        save_dir=str(tmp_path / "o"),
        output_dir=str(tmp_path / "r"),
        max_meta_loop_iterations=2,
    )
    llm = FlakyLLM(fail_every=3)
    rag = ComoRAG(config, llm=llm)
    return rag, llm


def test_meta_loop_survives_llm_failures(flaky_rag):
    rag, llm = flaky_rag
    rag.index(
        [
            "The courier Selim carried the sealed treaty across the mountain pass.",
            "Bandits ambushed the caravan but the treaty stayed hidden in a false boot heel.",
            "Selim delivered the treaty to the border fort at Kalvane before dawn.",
        ]
    )
    sols = rag.try_answer(
        [
            "Who carried the sealed treaty?",
            "Where was the treaty hidden?",
            "Which fort received the treaty?",
        ]
    )
    # every question gets a QuerySolution even though ~1/3 of LLM calls died
    assert len(sols) == 3
    assert llm.failures > 0, "injection never fired — test is vacuous"
    assert all(isinstance(s.answer, str) for s in sols)
    # at least one question still lands the gold chunk despite the failures
    joined = " ".join(s.answer for s in sols)
    assert "treaty" in joined


def test_openie_failures_do_not_kill_indexing(tmp_path):
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=64,
        need_cluster=False,
        save_dir=str(tmp_path / "o2"),
        output_dir=str(tmp_path / "r2"),
    )
    llm = FlakyLLM(fail_every=2)  # every other call dies
    rag = ComoRAG(config, llm=llm)
    rag.index(["Arn forged the bell.", "Mira Okonkwo rang the bell at noon in Kalvane.", "The bell cracked in winter."])
    # indexing completed and produced a queryable store
    assert len(rag.ver_store) == 3
    res = rag.engine.tri_retrieve("Who forged the bell?")
    assert res.veridical


def test_openie_errored_chunks_retry_on_next_index(tmp_path):
    """Chunks whose OpenIE LLM call ERRORED must not be persisted as empty
    extractions — the resume path would skip them forever, and a transient
    outage would permanently strip their entities/facts/graph edges."""
    import json
    import os

    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=64,
        need_cluster=False,
        skip_graph=True,
        save_dir=str(tmp_path / "o3"),
        output_dir=str(tmp_path / "r3"),
    )

    class PoisonNER(FakeLLM):
        """Errors every call that mentions the poisoned passage."""

        def __init__(self):
            super().__init__()
            self.poisoned = True

        def infer(self, messages, **kw):
            user = [m["content"] for m in messages if m["role"] == "user"][-1]
            if self.poisoned and "Okonkwo" in user:
                raise ConnectionError("injected outage")
            return super().infer(messages, **kw)

    llm = PoisonNER()
    rag = ComoRAG(config, llm=llm)
    docs = ["Arn forged the bell.", "Mira Okonkwo rang the bell at noon in Kalvane."]
    rag.index(docs)

    with open(rag.openie_results_path, encoding="utf-8") as f:
        persisted = json.load(f)["docs"]
    assert len(persisted) == 1  # the errored chunk stayed un-persisted
    assert "Arn forged" in persisted[0]["passage"]

    # outage over: a fresh index() retries ONLY the failed chunk
    llm.poisoned = False
    rag2 = ComoRAG(ComoConfig(**{**config.to_dict()}), llm=llm)
    rag2.index(docs)
    with open(rag2.openie_results_path, encoding="utf-8") as f:
        persisted = json.load(f)["docs"]
    assert len(persisted) == 2
    mira = next(d for d in persisted if "Mira" in d["passage"])
    assert mira["extracted_entities"]  # real extraction this time


def test_failed_summaries_force_rebuild(tmp_path):
    """Timeline windows / semantic-tree clusters whose summary LLM call
    errored must mark the artifact incomplete so the next build retries
    (instead of validating the thinned layer forever)."""
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=64,
        need_cluster=True,
        skip_graph=True,
        save_dir=str(tmp_path / "o4"),
        output_dir=str(tmp_path / "r4"),
        gmm_max_clusters=2,
        gmm_em_iterations=10,
    )

    class FailSummaries(FakeLLM):
        def __init__(self):
            super().__init__()
            self.failing = True

        def infer(self, messages, **kw):
            sys_prompt = next((m["content"] for m in messages if m["role"] == "system"), "")
            user = [m["content"] for m in messages if m["role"] == "user"][-1]
            if self.failing and ("summar" in sys_prompt.lower() or "summar" in user.lower()):
                raise ConnectionError("injected outage")
            return super().infer(messages, **kw)

    docs = [f"Chapter {i}: the caravan reached waypoint {i} and traded salt." for i in range(12)]
    llm = FailSummaries()
    rag = ComoRAG(config, llm=llm)
    rag.index(docs)
    n_sem_thinned = len(rag.sem_store)
    n_epi_thinned = len(rag.epi_store)

    # outage over: re-index must RETRY the failed summaries, not reuse
    llm.failing = False
    rag2 = ComoRAG(ComoConfig(**{**config.to_dict()}), llm=llm)
    rag2.index(docs)
    assert len(rag2.epi_store) > n_epi_thinned
    assert len(rag2.sem_store) >= max(n_sem_thinned, 1)

    # and a THIRD run on the now-complete artifacts reuses them (no rebuild)
    from comorag_tpu.timeline.summarizer import TimelineSummarizer  # noqa: F401
    rag3 = ComoRAG(ComoConfig(**{**config.to_dict()}), llm=llm)
    calls_before = len(llm.calls)
    rag3.index(docs)
    assert len(llm.calls) == calls_before  # everything served from artifacts
