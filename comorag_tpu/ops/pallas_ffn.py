"""Fused encoder FFN half-layer (LN -> matmul -> gelu -> matmul ->
residual -> LN) in one VMEM pass.

Reference capability: the HF BertIntermediate/BertOutput pair plus both
LayerNorms inside the encoder forward (BGEEmbedding.py:111-128 drives it
through torch).

Why a kernel (r3 trace, PERF.md "Fused encoder attention"): with the
attention kernel in the graph, XLA lowers LN + ffn_in + gelu into an
`EmitAllBatchInSublanes` windowed-conv mega-fusion at ~1.8 ms/layer
against a ~0.7 ms matmul entitlement, and the only XLA-level control —
`optimization_barrier` placement — was measured to a local optimum well
short of it (barriers around every stage made it WORSE by materializing
the [B, S, 4H] mid tensor in HBM). Everything between the attention
output and the next layer's projections is row-local, so the whole
half-layer fuses into one row-tiled program:

    x1[TN, H]  = LN(xres_tile) * s1 + b1n   (VPU, fp32)
    mid[TN, I] = x1 @ W1 + b1               (MXU, fp32 accumulate)
    mid        = gelu_exact(mid)            (VPU, fp32 erf polynomial)
    f[TN, H]   = mid @ W2 + b2              (MXU, fp32 accumulate)
    out[TN, H] = LN(x1 + f) * s2 + b2n      (VPU, fp32)

— the [B, S, 4H] gelu mid tensor never touches HBM and the two LNs stop
paying their own [B, S, H] read+write round-trips (~0.23 ms/layer at the
deployment shape). The weights index-map to block (0, 0) for every grid
step, so Mosaic fetches them once and they stay VMEM-resident across the
whole row grid (~9 MB bf16 at bert-base — the xres/out tiles are the
only streaming traffic).

fp32 accumulation + fp32 bias + fp32 gelu matches the XLA path's
precision envelope (both feed bf16 operands to the MXU; the XLA path
passes no `precision` either), and x1 quantizes to the compute dtype
between LN1 and the first dot exactly like the XLA path's
`.astype(compute_dtype)`.

Inference-path only (no custom VJP) — training keeps the XLA FFN, whose
backward XLA already fuses well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

_SQRT2 = 1.4142135623730951


def _erf(x):
    """Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — three decades
    below bf16 resolution, so gelu parity with the XLA exact-erf path is
    unchanged): Mosaic has no erf lowering, but exp it has. exp(-x^2)
    underflow past |x|~9.3 returns exactly erf=±1, the right answer."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x >= 0, y, -y)


def _ln(x32, scale_ref, bias_ref, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return c * jax.lax.rsqrt(var + eps) * scale_ref[...] + bias_ref[...]


def _ffn_kernel(x_ref, s1_ref, n1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                s2_ref, n2_ref, o_ref, *, eps: float):
    x1 = _ln(x_ref[...].astype(jnp.float32), s1_ref, n1_ref, eps)
    x1 = x1.astype(o_ref.dtype)         # the XLA path's post-LN1 cast
    mid = jax.lax.dot_general(
        x1, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)  # [TN, I]
    mid = 0.5 * mid * (1.0 + _erf(mid / _SQRT2))  # exact gelu (HF parity)
    f = jax.lax.dot_general(
        mid.astype(x1.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    out = _ln(x1.astype(jnp.float32) + f, s2_ref, n2_ref, eps)
    o_ref[...] = out.astype(o_ref.dtype)


def ffn_block_rows(n_rows: int, target: int = 256) -> int:
    """Largest power-of-two row tile <= target that divides n_rows
    (grids must be exact; seq buckets and batches are powers of two)."""
    tn = target
    while tn > 1 and n_rows % tn:
        tn //= 2
    return tn


def fused_ffn_supported(n_rows: int, hidden: int, inter: int) -> bool:
    """Mosaic block legality: lane dims must be 128-divisible and the row
    tile must cover the sublane quantum. Tiny test arches fall back."""
    return hidden % 128 == 0 and inter % 128 == 0 and ffn_block_rows(n_rows) >= 8


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_encoder_ffn(
    xres: jnp.ndarray,       # [B, S, H] (or [N, H]) pre-LN residual input
    ln1_scale: jnp.ndarray,  # [H]
    ln1_bias: jnp.ndarray,   # [H]
    w1: jnp.ndarray,         # [H, I]
    b1: jnp.ndarray,         # [I]
    w2: jnp.ndarray,         # [I, H]
    b2: jnp.ndarray,         # [H]
    ln2_scale: jnp.ndarray,  # [H]
    ln2_bias: jnp.ndarray,   # [H]
    eps: float = 1e-12,
    block_rows: int = 256,   # the [TN, I] fp32 gelu temporaries live on the
    # Mosaic scoped-VMEM stack (16 MB limit): TN=512 allocated 18.4 MB
    # and OOMed the fp32 compile; 256 fits both dtypes with room
    interpret: bool = False,
) -> jnp.ndarray:
    """x1 = LN(xres); returns LN(x1 + gelu(x1 @ w1 + b1) @ w2 + b2), the
    post-attention half of a BERT layer, in xres's shape and dtype."""
    shape = xres.shape
    h = shape[-1]
    i = w1.shape[-1]
    xr = xres.reshape(-1, h)
    n = xr.shape[0]
    tn = min(block_rows, ffn_block_rows(n, block_rows))

    def vec(v, width):
        return v.reshape(1, width).astype(jnp.float32)

    const = lambda r: (0, 0)  # noqa: E731 — weights/vectors stay resident
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, h), xres.dtype),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, h), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, i), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((i, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, h), lambda r: (r, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        xr,
        vec(ln1_scale, h), vec(ln1_bias, h),
        w1.astype(xres.dtype), vec(b1, i),
        w2.astype(xres.dtype), vec(b2, h),
        vec(ln2_scale, h), vec(ln2_bias, h),
    )
    return out.reshape(shape)
