"""Encoder factory.

Reference counterpart: embedding_model/__init__.py:10-17 — which silently
returns ``None`` for unknown names (a latent bug, SURVEY.md §7.3). Here an
unknown name raises.

Name scheme:
  - ``hash``                 -> hermetic HashEncoder (tests, offline dev)
  - ``bge:<hf-model-name>``  -> JAX BGE-class encoder (weights from HF)
  - ``openai:<model-name>``  -> remote OpenAI-compatible embeddings API
  - bare HF-style names containing "bge" route to the JAX encoder for
    compatibility with reference configs.
"""

from __future__ import annotations

from comorag_tpu.config import ComoConfig
from comorag_tpu.models.base import BaseEncoder
from comorag_tpu.models.hash_encoder import HashEncoder


def get_encoder(config: ComoConfig, mesh=None) -> BaseEncoder:
    enc = _build_encoder(config, mesh)
    # reference knob parity (config_utils.py embedding_return_as_normalized):
    # encode() calls that don't pass norm= follow this default, so an
    # unnormalized deployment keeps queries and corpus in one space
    enc.default_norm = bool(config.embedding_return_as_normalized)
    return enc


def _build_encoder(config: ComoConfig, mesh=None) -> BaseEncoder:
    name = config.embedding_model_name
    if name == "hash" or name.startswith("hash:"):
        dim = config.embedding_dim
        return HashEncoder(dim=dim)
    if name.startswith("bge:") or "bge" in name.lower():
        from comorag_tpu.models.bge import BGEJaxEncoder

        hf_name = name.split(":", 1)[1] if ":" in name else name
        import jax.numpy as jnp

        return BGEJaxEncoder(
            hf_name,
            max_seq_len=config.embedding_max_seq_len,
            batch_size=config.embedding_batch_size,
            mesh=mesh,
            compute_dtype=jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32,
        )
    if name.startswith("openai:") or name.startswith("text-embedding"):
        from comorag_tpu.models.remote import RemoteEncoder

        model = name.split(":", 1)[1] if ":" in name else name
        return RemoteEncoder(
            model=model,
            base_url=config.embedding_base_url,
            api_key=config.embedding_api_key,
        )
    raise ValueError(
        f"Unknown embedding model name: {name!r}. "
        "Use 'hash', 'bge:<hf-name>', or 'openai:<model>'."
    )
