"""Fused (flash-style) bidirectional attention for the encoder hot path.

Reference capability: the torch/HF encoder forward inside
BGEEmbedding.py:111-128 (its attention materializes the full score
tensor). The XLA path in models/bge.py does the same on TPU: the
``[B, H, S, S]`` fp32 score tensor round-trips HBM twice per layer —
at the deployment shape (B=32, 12 heads, S=512) that's ~400 MB of HBM
traffic per layer that never needed to leave the chip.

LAYOUT IS HALF THE WIN (r3 profile, PERF.md "Encoder"): the first
version of this kernel took ``[B, H, S, dh]`` operands, which forced
three input transposes and one output transpose per layer — and the
output relayout fused into the following LayerNorm's convert+reduce,
which the trace showed costing ~13x the other LayerNorm (47% of the
whole forward). This version reads q/k/v and writes the context in the
projections' NATIVE ``[B, S, H]`` layout; heads are static slices of
the lane dimension inside the kernel (``hp = 128 // head_dim`` heads
per program keep the block's lane width Mosaic-legal), so no transpose
exists anywhere in the layer.

Per (batch, head-group, q-block) program:

    scores[TQ, S] = q_blk @ k.T          (MXU, fp32 accumulate)
    softmax over the fully-resident row   (VPU, fp32 — exact, no
                                           streaming rescale needed at
                                           encoder lengths)
    ctx[TQ, dh]  = probs @ v              (MXU)

Padded key positions mask to -1e30 in fp32 before the softmax, matching
models/bge.py exactly. Inference-path only (no custom VJP): training
keeps the XLA attention, whose backward XLA already fuses well; the
encode path is where the corpus-scale HBM traffic lives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                 head_dim: int, heads_per_block: int):
    q = q_ref[0]              # [TQ, hp*dh]
    k = k_ref[0]              # [S, hp*dh]
    v = v_ref[0]              # [S, hp*dh]
    mask = mask_ref[0, 0, 0]  # [S]
    bias = jnp.where(mask > 0, 0.0, -1e30)[None, :].astype(jnp.float32)
    for j in range(heads_per_block):
        lo, hi = j * head_dim, (j + 1) * head_dim
        s = jax.lax.dot_general(
            q[:, lo:hi], k[:, lo:hi],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                     # [TQ, S]
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jnp.dot(p.astype(v.dtype), v[:, lo:hi],
                      preferred_element_type=jnp.float32)
        o_ref[0, :, lo:hi] = (ctx / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "interpret"))
def flash_encoder_attention(
    q: jnp.ndarray,     # [B, S, H]  (H = num_heads * head_dim, projection-native)
    k: jnp.ndarray,     # [B, S, H]
    v: jnp.ndarray,     # [B, S, H]
    mask: jnp.ndarray,  # [B, S] int32/bool, 1 = valid key
    num_heads: int,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns ctx [B, S, H] in q's dtype (fp32 softmax inside)."""
    b, s, h = q.shape
    dh = h // num_heads
    # Mosaic block rule: the lane dim of every block must be 128-divisible
    # or equal the full array dim. Group heads so hp*dh satisfies it
    # (bert-base: dh=64 -> 2 heads per program; tiny arches fall back to
    # the whole width, which is legal by the equal-to-array-dim clause).
    hp = num_heads
    for cand in range(1, num_heads + 1):
        if num_heads % cand == 0 and (cand * dh) % 128 == 0:
            hp = cand
            break
    hw = hp * dh
    bq = min(block_q, s)
    while s % bq:
        bq //= 2  # seq buckets are powers of two; keep the grid exact
    scale = 1.0 / (dh ** 0.5)
    grid = (b, num_heads // hp, s // bq)
    # [B, 1, 1, S]: a [1, S] block of a [B, S] mask is not Mosaic-legal;
    # a [1, 1, 1, S] block of this is (last two dims equal the array's)
    mask_i = mask.astype(jnp.int32).reshape(b, 1, 1, s)

    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, head_dim=dh,
                          heads_per_block=hp),
        out_shape=jax.ShapeDtypeStruct((b, s, h), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hw), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, hw), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, hw), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s), lambda bi, hi, qi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hw), lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, mask_i)
