"""Wiring smoke test for the REALISTIC stack (VERDICT r2 #2).

Every other e2e test pairs the hash encoder with the fake LLM; this one
couples the real components the deployment uses — the JAX BGE-class
transformer encoder and the in-process JAX generation engine behind the
window-batching server — through index (guided-JSON OpenIE), tri-layer
retrieval, and the threaded meta QA loop. Tiny shapes + random weights
keep it CI-fast; the full-scale on-chip run is
scripts/bench_realistic_e2e.py (reference shape: main_vllm.py:10-95).
"""

import jax
import numpy as np

from comorag_tpu.comorag import ComoRAG
from comorag_tpu.config import ComoConfig
from comorag_tpu.llm.jax_offline import JaxOfflineLLM
from comorag_tpu.llm.serving import GenerationServer
from comorag_tpu.models.bge import (
    BGEJaxEncoder,
    EncoderArch,
    SimpleHashTokenizer,
    init_params,
)


def test_realistic_stack_index_retrieve_answer(tmp_path):
    arch = EncoderArch.tiny()
    encoder = BGEJaxEncoder(
        params=init_params(jax.random.PRNGKey(0), arch),
        arch=arch,
        tokenizer=SimpleHashTokenizer(arch.vocab_size),
        batch_size=8,
    )
    engine = JaxOfflineLLM(speculative=True, max_new_tokens=32)
    llm = GenerationServer(engine)
    assert llm.supports_guided_json  # OpenIE takes the guided-JSON route

    config = ComoConfig(
        llm_name="jax-offline",
        embedding_model_name="bge:tiny-random",
        embedding_dim=arch.hidden_size,
        need_cluster=False,
        response_format=True,
        save_dir=str(tmp_path / "outputs"),
        output_dir=str(tmp_path / "results"),
        max_meta_loop_iterations=1,
    )
    rag = ComoRAG(config, llm=llm, encoder=encoder)

    chunks = [
        f"Record {i}: keeper {i} stored the {item} at the {place}."
        for i, (item, place) in enumerate(
            (it, pl)
            for it in ("lantern", "ledger", "compass", "anvil")
            for pl in ("harbor", "mill", "archive")
        )
    ]
    rag.index(chunks)
    assert len(rag.ver_store) == len(chunks)

    results = rag.engine.tri_retrieve_batch(
        ["Where was the lantern stored?", "Who kept the compass?"], ver_top_k=5
    )
    assert len(results) == 2
    assert len(results[0].veridical) == 5
    # real-encoder embeddings are L2-normalized through the whole path
    emb = rag.engine.encode_queries(["check"])["passage"]
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb)), 1.0, atol=1e-4)

    sols = rag.try_answer(["Where was the lantern stored?"])
    assert len(sols) == 1 and isinstance(sols[0].answer, str)
    meta = engine.infer(
        [{"role": "user", "content": "extract"}], max_tokens=24, json_template="ner"
    )
    assert meta.metadata.get("decode_steps", 0) >= 1  # speculative loop live
