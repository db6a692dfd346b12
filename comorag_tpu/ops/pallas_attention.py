"""Fused (flash-style) bidirectional attention for the encoder hot path.

Reference capability: the torch/HF encoder forward inside
BGEEmbedding.py:111-128 (its attention materializes the full score
tensor). The XLA path in models/bge.py does the same on TPU: the
``[B, H, S, S]`` fp32 score tensor round-trips HBM twice per layer —
at the deployment shape (B=32, 12 heads, S=512) that's ~400 MB of HBM
traffic per layer that never needed to leave the chip. This kernel
computes attention per (batch, head, q-block) program with the score
block resident in VMEM:

    scores[TQ, S] = q_block @ k.T        (MXU, fp32 accumulate)
    softmax over the full key row         (VPU, fp32)
    ctx[TQ, dh]  = probs @ v              (MXU)

S is the encoder's 512-token bucket, so one q-block's score slab is
256 x 512 x 4 B = 512 KB — no K-streaming/rescaling pass is needed
(unlike causal-LM flash attention at 8k+ context); the softmax is exact
over the fully-resident row, which keeps numerics bit-comparable to the
XLA path. Padded key positions mask to -1e30 in fp32 before the
softmax, matching models/bge.py exactly.

The kernel is inference-path only (no custom VJP): training keeps the
XLA attention, whose backward XLA already fuses well; the encode path is
where the corpus-scale HBM traffic lives (SURVEY §2.2 encoder serving).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]          # [TQ, dh]
    k = k_ref[0, 0]          # [S, dh]
    v = v_ref[0, 0]          # [S, dh]
    mask = mask_ref[0, 0, 0]  # [S]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                        # [TQ, S]
    s = s * scale + jnp.where(mask > 0, 0.0, -1e30)[None, :].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    ctx = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (ctx / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_encoder_attention(
    q: jnp.ndarray,     # [B, H, S, dh]
    k: jnp.ndarray,     # [B, H, S, dh]
    v: jnp.ndarray,     # [B, H, S, dh]
    mask: jnp.ndarray,  # [B, S] int32/bool, 1 = valid key
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns ctx [B, H, S, dh] in q's dtype (fp32 softmax inside)."""
    b, h, s, dh = q.shape
    bq = min(block_q, s)
    while s % bq:
        bq //= 2  # seq buckets are powers of two; keep the grid exact
    scale = 1.0 / (dh ** 0.5)
    grid = (b, h, s // bq)
    # [B, 1, 1, S]: Mosaic requires a block's last two dims to be
    # (8k, 128k)-divisible OR equal to the array dims — a [1, S] block of
    # a [B, S] mask satisfies neither, a [1, 1, 1, S] block of this does
    mask_i = mask.astype(jnp.int32).reshape(b, 1, 1, s)

    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s), lambda bi, hi, qi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, mask_i)
