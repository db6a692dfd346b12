from comorag_tpu.llm.base import BaseLLM, LLMResponse
from comorag_tpu.llm.fake import FakeLLM
from comorag_tpu.llm.openai_client import OpenAIChatLLM


def get_llm(config, mesh=None) -> BaseLLM:
    """LLM factory (reference counterpart: llm/__init__.py:12-15, which
    always returns CacheOpenAI; the vLLM engine is selected by a separate
    main, main_vllm.py:10-95). Routes:

      - ``fake`` / ``fake:*``       -> hermetic scripted test LLM
      - ``jax-offline``             -> in-process TPU engine, hermetic tiny
                                       weights (tests/benches/dryruns)
      - ``jax-tiny``                -> in-process engine on the committed
                                       TRAINED tiny checkpoint
                                       (assets/tiny_lm.npz, recipe:
                                       scripts/train_tiny_lm.py) — hermetic
                                       answer quality above the fake-LLM
                                       floor
      - ``jax:<local checkpoint>``  -> in-process TPU engine on a local
                                       llama-, qwen2/3- or gemma-family checkpoint, optionally
                                       tensor-parallel over ``mesh``
      - anything else              -> OpenAI-compatible HTTP client
    """
    name = str(config.llm_name)
    if name == "fake" or name.startswith("fake:"):
        return FakeLLM()
    if name == "jax-tiny":
        from comorag_tpu.llm.jax_offline import JaxOfflineLLM
        from comorag_tpu.llm.serving import GenerationServer
        from comorag_tpu.models.curriculum import (
            default_checkpoint_path,
            load_tiny_checkpoint,
        )

        params, arch = load_tiny_checkpoint(default_checkpoint_path())
        engine = JaxOfflineLLM(
            params=params,
            arch=arch,
            mesh=mesh,
            temperature=0.0,  # the trained behaviors are greedy-decoded
            max_new_tokens=384,  # matches the training curriculum's budget
            seed=getattr(config, "seed", 0) or 0,
            speculative=bool(getattr(config, "speculative_decoding", False)),
        )
        return GenerationServer(engine)
    if name == "jax-offline" or name.startswith("jax:"):
        from comorag_tpu.llm.jax_offline import JaxOfflineLLM

        import jax.numpy as jnp

        from comorag_tpu.llm.serving import GenerationServer

        path = name[len("jax:"):] if name.startswith("jax:") else ""
        path = path or None  # "jax-offline" / bare "jax:" -> hermetic tiny engine
        bf16 = getattr(config, "compute_dtype", "float32") == "bfloat16"
        engine = JaxOfflineLLM(
            model_name_or_path=path,
            mesh=mesh,
            temperature=getattr(config, "temperature", 0.0) or 0.0,
            max_new_tokens=getattr(config, "max_new_tokens", 2048) or 2048,
            seed=getattr(config, "seed", 0) or 0,
            compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
            param_dtype=jnp.bfloat16 if bf16 else None,
            speculative=bool(getattr(config, "speculative_decoding", False)),
            kv_dtype=getattr(config, "kv_cache_dtype", None),
        )
        # the meta loop calls infer() from up to 16 question threads
        # (ComoRAG.try_answer); the window scheduler turns those into
        # shared device programs instead of 16 queued single-row decodes
        return GenerationServer(engine)
    return OpenAIChatLLM.from_config(config)


__all__ = ["BaseLLM", "LLMResponse", "FakeLLM", "OpenAIChatLLM", "get_llm"]
