"""Fused int4 (nibble-packed) matmul — the 4-bit decode-weight kernel.

Counterpart of vLLM's quantized-weight serving (reference
vllm_offline.py delegates to vLLM; its quantization config is the
capability being matched). The r3 decode profile showed generation
bandwidth-entitled at int8 weights ("further gains need smaller
weights — 4-bit"); this kernel reads 0.5 bytes per weight element from
HBM — the one remaining decode lever on a bandwidth-bound chip.

Why Pallas and not XLA: an XLA-level nibble unpack cannot beat int8 —
either the unpacked bf16 matrix materializes in HBM (2 bytes/element)
or the packed buffer is read once per nibble half (2 x 0.5 = 1
byte/element, i.e. int8 traffic). Only a kernel that unpacks IN VMEM
reads each byte exactly once.

Unpack mechanics (measured on this chip): Mosaic legalizes NO int8/int16
shifts or multiplies, and int32-domain shifts waste 4x VPU lane width —
but ``pltpu.bitcast(int8[R, C], int4)`` reinterprets the buffer as
``int4[2R, C]`` with byte (r, c)'s LOW nibble at row 2r and HIGH nibble
at row 2r+1 (sign-extended), and the int4 -> bf16 convert is native. So
the weights are packed with INTERLEAVED input-row pairs —
``byte[r] = (w[2r+1] << 4) | (w[2r] & 0xF)`` — and the whole unpack is
ONE bitcast + ONE convert; the bitcast output is the weight tile in
natural row order. (The jnp.int4 dtype is unusable at the JAX level on
the axon plugin — jit on int4 operands crashes it — so nibbles ride
int8 storage and only exist as int4 inside the kernel.)

Scales are per-(input-group, output-channel) fp32 (``group_size`` inputs
per group — per-channel-only int4 loses too much precision), applied as
[1, TN] epilogues on the group's [TM, TN] partial product. The kernel
tiles (m, out); each grid step DMAs the full contraction's packed block
(multi-MB, pipelined across out tiles by Mosaic) and runs a statically
unrolled group loop of back-to-back MXU dots — a (m, out, group) grid
ran 2.7x slower from per-step overhead on 128-deep micro-dots.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def quantize_int4_grouped(
    w: jnp.ndarray, group_size: int = 128
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(input-group, out-channel) symmetric int4 quantization, on
    device (same rationale as decoder._quantize: pulling 1B-scale weights
    to the host through a remote tunnel costs minutes).

    w [in, out] (in divisible by group_size; group_size even) ->
    (packed [in/2, out] int8 with interleaved input-row pairs — see the
    module docstring — and scales [in/group_size, out] f32).
    """
    d_in, d_out = w.shape
    assert d_in % group_size == 0 and group_size % 2 == 0, (d_in, group_size)
    arr = jnp.asarray(w, jnp.float32).reshape(d_in // group_size, group_size, d_out)
    amax = jnp.max(jnp.abs(arr), axis=1, keepdims=True)
    scale = (amax / 7.0 + 1e-12).astype(jnp.float32)
    q = jnp.clip(jnp.round(arr / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(d_in, d_out)
    lo = q[0::2]  # even input rows -> low nibbles
    hi = q[1::2]  # odd input rows -> high nibbles
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, 0xF), jnp.left_shift(jnp.bitwise_and(hi, 0xF), 4)
    ).astype(jnp.int8)
    return packed, scale[:, 0, :]


def _unpack_rows(p: jnp.ndarray) -> jnp.ndarray:
    """Host/XLA-path unpack of the interleaved layout: int8 [R, C] ->
    int32 [2R, C] with byte r's nibbles at rows (2r, 2r+1)."""
    v = p.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(v, 28), 28)
    hi = jax.lax.shift_right_arithmetic(v, 4)
    return jnp.stack([lo, hi], axis=1).reshape(2 * p.shape[0], p.shape[1])


def _make_int4_kernel(group_size: int, n_groups: int):
    """Kernel over one (m, out) tile with the FULL contraction resident
    in VMEM and a statically-unrolled group loop: per group, unpack that
    slab (bitcast + native int4->bf16 convert), one 128-deep MXU dot,
    scale epilogue, f32 accumulate.

    Two "obvious" improvements were built and measured SLOWER end-to-end
    (0.89B decode-isolated, B=8): (a) dequantize the whole tile into a
    bf16 VMEM scratch then one full-depth dot — 3,053 tok/s; (b) the same
    as a register value via reshape-multiply — 3,337 tok/s; vs 4,457 for
    this group-dot loop. Mosaic overlaps group g+1's VPU unpack with
    group g's MXU dot in the unrolled loop, while both single-dot forms
    serialize the whole dequant pass before the MXU can start. A
    (m, out, group) grid was also 2.7x slower (per-step overhead on
    128-deep micro-dots)."""
    rows_per_group = group_size // 2  # packed rows per input group

    def kernel(
        x_ref,       # [TM, in] bf16
        packed_ref,  # [in/2, TN] int8 (interleaved pairs)
        s_ref,       # [n_groups, TN] f32
        out_ref,     # [TM, TN] f32
    ):
        acc = None
        for g in range(n_groups):
            p = packed_ref[g * rows_per_group : (g + 1) * rows_per_group, :]
            # the whole unpack: reinterpret nibbles as int4 rows (byte r ->
            # rows 2r, 2r+1 in natural order) + native int4->bf16 convert
            w = pltpu.bitcast(p, jnp.int4).astype(jnp.bfloat16)  # [gs, TN]
            x_g = x_ref[:, g * group_size : (g + 1) * group_size]
            d = jnp.dot(x_g, w, preferred_element_type=jnp.float32)
            d = d * s_ref[pl.ds(g, 1), :]
            acc = d if acc is None else acc + d
        out_ref[:] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("group_size", "tile_m", "tile_n", "interpret")
)
def int4_matmul(
    x: jnp.ndarray,       # [M, in] (any float dtype; computed in bf16)
    packed: jnp.ndarray,  # [in/2, out] int8 (quantize_int4_grouped layout)
    scales: jnp.ndarray,  # [in/group_size, out] f32
    group_size: int = 128,
    tile_m: int = 16,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ dequant(packed, scales) -> [M, out] f32. M and out are padded
    to tile boundaries internally; ``in`` must be divisible by
    ``group_size`` (even)."""
    m, d_in = x.shape
    half, d_out = packed.shape
    assert half * 2 == d_in, (half, d_in)
    n_groups = d_in // group_size
    assert scales.shape == (n_groups, d_out), (scales.shape, n_groups, d_out)

    # bf16 min sublane tile is 16 — keep tile_m at least that; for
    # prefill-sized M, grow the tile to full MXU rows (decode's M=16
    # wastes 7/8 of the systolic array unavoidably, but a 128-row tile at
    # M>=128 restores full utilization for the prompt pass)
    tile_m = max(16, tile_m)
    if m > tile_m:
        tile_m = 128
    m_pad = _round_up(m, tile_m)
    n_pad = _round_up(d_out, tile_n)
    xb = x.astype(jnp.bfloat16)
    if m_pad != m:
        xb = jnp.pad(xb, ((0, m_pad - m), (0, 0)))
    pk = packed
    sc = scales
    if n_pad != d_out:
        pk = jnp.pad(pk, ((0, 0), (0, n_pad - d_out)))
        sc = jnp.pad(sc, ((0, 0), (0, n_pad - d_out)))

    if interpret:
        # the interpreter can't evaluate the int8->int4 bitcast trick;
        # tests run the same contraction via the XLA unpack
        w = _unpack_rows(pk).astype(jnp.float32)
        w = w.reshape(n_groups, group_size, n_pad) * sc[:, None, :]
        out = jnp.dot(
            xb.astype(jnp.float32), w.reshape(d_in, n_pad),
            preferred_element_type=jnp.float32,
        )
        return out[:m, :d_out]

    grid = (m_pad // tile_m, n_pad // tile_n)
    out = pl.pallas_call(
        _make_int4_kernel(group_size, n_groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, d_in), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, pk, sc)
    return out[:m, :d_out]


def dequantize_int4(packed: jnp.ndarray, scales: jnp.ndarray, group_size: int = 128) -> jnp.ndarray:
    """Reference dequant (tests + the XLA fallback path): [in, out] f32."""
    half, d_out = packed.shape
    w = _unpack_rows(packed).astype(jnp.float32)
    w = w.reshape(-1, group_size, d_out)
    return (w * scales[:, None, :]).reshape(half * 2, d_out)
