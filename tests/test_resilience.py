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
    rag.index(["Arn forged the bell.", "Mira rang the bell at noon.", "The bell cracked in winter."])
    # indexing completed and produced a queryable store
    assert len(rag.ver_store) == 3
    res = rag.engine.tri_retrieve("Who forged the bell?")
    assert res.veridical
