from comorag_tpu.llm.base import BaseLLM, LLMResponse
from comorag_tpu.llm.fake import FakeLLM
from comorag_tpu.llm.openai_client import OpenAIChatLLM


def get_llm(config) -> BaseLLM:
    """LLM factory (reference counterpart: llm/__init__.py:12-15, which
    always returns CacheOpenAI). 'fake' routes to the hermetic test LLM."""
    if config.llm_name == "fake" or str(config.llm_name).startswith("fake:"):
        return FakeLLM()
    return OpenAIChatLLM.from_config(config)


__all__ = ["BaseLLM", "LLMResponse", "FakeLLM", "OpenAIChatLLM", "get_llm"]
