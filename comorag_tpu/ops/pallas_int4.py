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


# --------------------------------------------------------------------------
# Fused decode layer tail: o-proj -> residual -> RMSNorm -> gate/up -> act
# -> down -> residual, ONE Pallas invocation (VERDICT r4 #5).
#
# The r4 decode profile showed int4 NOT faster than int8 end-to-end: the
# saved weight bytes (~0.54 ms/step) were eaten by ~0.76 ms/step of Mosaic
# per-invocation overhead across 65 kernel launches (16 layers x 4 dots +
# head). Everything between a layer's o-projection and the NEXT matmul is
# elementwise (residual adds, RMSNorm, the SiLU/GELU gate) — so the three
# FFN-side dots fuse into one staged kernel and decode drops to 2L+1
# launches (qkv + fused tail per layer, + lm_head). Attention sits between
# qkv and o, so qkv cannot join without a megakernel.
#
# Stage layout over ONE "arbitrary" grid axis (1 + n_gu + n_down steps):
#   step 0:            o dot (full H width, 2.1 MB weights resident) +
#                      residual -> xmid scratch (flat for the norm, tiled
#                      for the down-stage residual)
#   steps 1..n_gu:     gate/up tile dots from xn (RMSNorm computed once at
#                      step 1) -> gu scratch [n_gu, M, TN]
#   steps n_gu+1..:    act(gate)*up once into h scratch (static tile pairs,
#                      no dynamic lane slicing), then down tile dots +
#                      xmid residual -> output tiles
# Weight blocks stream per step (index maps clamp, so o/ctx/x_res fetch
# once); all scratch indexing is static or major-axis-dynamic — Mosaic
# never dynamic-slices the lane dimension.
# --------------------------------------------------------------------------


def fused_tail_supported(
    hidden: int, intermediate: int, group_size: int, m: int, tile_n: int = 512
) -> bool:
    """Static shape gate for ``int4_fused_layer_tail``: decode-sized M
    (scratch is [M, 2I] f32 — prefill M would blow VMEM) and tile-aligned
    widths. ``tile_n`` must divide H, I (so gate/up tiles pair exactly)
    and be a multiple of the quant group (static group slices)."""
    return (
        m <= 64
        and tile_n % group_size == 0
        and hidden % tile_n == 0
        and intermediate % tile_n == 0
        and hidden % group_size == 0
        and intermediate % group_size == 0
    )


def _make_fused_tail_kernel(
    hidden: int,
    inter: int,
    group_size: int,
    tile_n: int,
    eps: float,
    unit_offset: bool,
    act: str,
):
    n_gu = (2 * inter) // tile_n
    n_h = inter // tile_n
    n_down = hidden // tile_n
    rpg = group_size // 2                 # packed rows per input group
    g_o = hidden // group_size            # o contraction groups
    g_gu = hidden // group_size
    g_down = inter // group_size
    tiles_per_group = tile_n // group_size  # h-scratch tiles a group spans

    if act == "silu":
        act_fn = jax.nn.silu
    elif act == "gelu_tanh":
        act_fn = lambda g: jax.nn.gelu(g, approximate=True)  # noqa: E731
    elif act == "gelu":
        act_fn = lambda g: jax.nn.gelu(g, approximate=False)  # noqa: E731
    else:
        raise ValueError(f"unknown act {act!r}")

    def _group_dot(x_of_g, packed_ref, scale_ref, n_groups):
        acc = None
        for g in range(n_groups):
            p = packed_ref[g * rpg : (g + 1) * rpg, :]
            w = pltpu.bitcast(p, jnp.int4).astype(jnp.bfloat16)
            d = jnp.dot(x_of_g(g), w, preferred_element_type=jnp.float32)
            d = d * scale_ref[pl.ds(g, 1), :]
            acc = d if acc is None else acc + d
        return acc

    def kernel(
        ctx_ref,    # [M, H] bf16 (attention context, flattened heads)
        xres_ref,   # [M, H] f32  (residual entering the o-projection add)
        nw_ref,     # [1, H] f32  (ffn_norm weight)
        op_ref,     # [H/2, H] int8
        os_ref,     # [g_o, H] f32
        gp_ref,     # [H/2, TN] int8 tile
        gs_ref,     # [g_gu, TN] f32 tile
        dp_ref,     # [I/2, TN] int8 tile
        ds_ref,     # [g_down, TN] f32 tile
        out_ref,    # [M, TN] f32 tile
        xmid_ref,   # scratch [M, H] f32
        xmid_t_ref, # scratch [n_down, M, TN] f32 (tiled copy for residual)
        xn_ref,     # scratch [M, H] bf16 (post-norm gu input)
        gu_ref,     # scratch [n_gu, M, TN] f32
        h_ref,      # scratch [n_h, M, TN] bf16
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _o_stage():
            acc = _group_dot(
                lambda g: ctx_ref[:, g * group_size : (g + 1) * group_size],
                op_ref, os_ref, g_o,
            )
            xmid = acc + xres_ref[...]
            xmid_ref[...] = xmid
            for j in range(n_down):  # static tiled copy for the down residual
                xmid_t_ref[j] = xmid[:, j * tile_n : (j + 1) * tile_n]

        @pl.when(i == 1)
        def _norm_stage():
            xmid = xmid_ref[...]
            var = jnp.mean(xmid * xmid, axis=-1, keepdims=True)
            normed = xmid * jax.lax.rsqrt(var + eps)
            w = nw_ref[...]
            if unit_offset:
                xn = normed * (1.0 + w)
            else:
                xn = normed * w
            xn_ref[...] = xn.astype(jnp.bfloat16)

        @pl.when(jnp.logical_and(i >= 1, i <= n_gu))
        def _gu_stage():
            acc = _group_dot(
                lambda g: xn_ref[:, g * group_size : (g + 1) * group_size],
                gp_ref, gs_ref, g_gu,
            )
            gu_ref[pl.ds(i - 1, 1)] = acc[None]

        @pl.when(i == n_gu + 1)
        def _act_stage():
            for j in range(n_h):  # static gate/up tile pairs
                gate = gu_ref[j]
                up = gu_ref[n_h + j]
                h_ref[j] = (act_fn(gate) * up).astype(jnp.bfloat16)

        @pl.when(i >= n_gu + 1)
        def _down_stage():
            acc = _group_dot(
                lambda g: h_ref[
                    g // tiles_per_group,
                    :,
                    (g % tiles_per_group) * group_size : (g % tiles_per_group + 1) * group_size,
                ],
                dp_ref, ds_ref, g_down,
            )
            j = i - (n_gu + 1)
            out_ref[...] = acc + xmid_t_ref[pl.ds(j, 1)][0]

    return kernel, n_gu, n_down


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "eps", "unit_offset", "act", "tile_n", "interpret"),
)
def int4_fused_layer_tail(
    ctx: jnp.ndarray,          # [M, H] float (attention output, pre-o-proj)
    x_res: jnp.ndarray,        # [M, H] float (residual into the attn add)
    norm_w: jnp.ndarray,       # [H] ffn_norm weight
    o_packed: jnp.ndarray, o_scale: jnp.ndarray,
    gu_packed: jnp.ndarray, gu_scale: jnp.ndarray,
    down_packed: jnp.ndarray, down_scale: jnp.ndarray,
    group_size: int = 128,
    eps: float = 1e-6,
    unit_offset: bool = False,
    act: str = "silu",
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x_res + FFN(norm(x_res + ctx @ o)) -> [M, H] f32, one kernel.

    Exact operation order of the unfused decoder path (decoder.one_layer
    attn-out through the FFN residual): all dots bf16-operand/f32-accum
    with per-group int4 scales, norm and residuals in f32."""
    m, hidden = ctx.shape
    inter = down_packed.shape[0] * 2
    assert gu_packed.shape == (hidden // 2, 2 * inter), (gu_packed.shape, hidden, inter)
    assert o_packed.shape == (hidden // 2, hidden)

    if interpret or jax.default_backend() in ("cpu", "gpu"):
        # portable fallback mirroring the kernel's math (the interpreter
        # can't evaluate the int8->int4 bitcast trick)
        ow = dequantize_int4(o_packed, o_scale, group_size)
        xmid = x_res.astype(jnp.float32) + jnp.dot(
            ctx.astype(jnp.float32), ow, preferred_element_type=jnp.float32
        )
        var = jnp.mean(xmid * xmid, axis=-1, keepdims=True)
        normed = xmid * jax.lax.rsqrt(var + eps)
        w32 = norm_w.astype(jnp.float32)
        xn = normed * (1.0 + w32) if unit_offset else normed * w32
        guw = dequantize_int4(gu_packed, gu_scale, group_size)
        gu = jnp.dot(xn, guw, preferred_element_type=jnp.float32)
        if act == "silu":
            a = jax.nn.silu(gu[:, :inter])
        elif act == "gelu_tanh":
            a = jax.nn.gelu(gu[:, :inter], approximate=True)
        else:
            a = jax.nn.gelu(gu[:, :inter], approximate=False)
        h = a * gu[:, inter:]
        dw = dequantize_int4(down_packed, down_scale, group_size)
        return xmid + jnp.dot(h, dw, preferred_element_type=jnp.float32)

    m_pad = _round_up(max(m, 16), 16)
    if m_pad != m:
        pad = ((0, m_pad - m), (0, 0))
        ctx = jnp.pad(ctx, pad)
        x_res = jnp.pad(x_res, pad)

    kernel, n_gu, n_down = _make_fused_tail_kernel(
        hidden, inter, group_size, tile_n, eps, unit_offset, act
    )
    grid = (1 + n_gu + n_down,)
    g_o = hidden // group_size
    g_gu = hidden // group_size
    g_down = inter // group_size

    def _gu_idx(i):
        return (0, jnp.clip(i - 1, 0, n_gu - 1))

    def _down_idx(i):
        return (0, jnp.clip(i - (n_gu + 1), 0, n_down - 1))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_o, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, tile_n), _gu_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((g_gu, tile_n), _gu_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((inter // 2, tile_n), _down_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((g_down, tile_n), _down_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, tile_n), _down_idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_pad, hidden), jnp.float32),
            pltpu.VMEM((n_down, m_pad, tile_n), jnp.float32),
            pltpu.VMEM((m_pad, hidden), jnp.bfloat16),
            pltpu.VMEM((n_gu, m_pad, tile_n), jnp.float32),
            pltpu.VMEM((inter // tile_n, m_pad, tile_n), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        ctx.astype(jnp.bfloat16),
        x_res.astype(jnp.float32),
        norm_w.astype(jnp.float32).reshape(1, hidden),
        o_packed, o_scale.astype(jnp.float32),
        gu_packed, gu_scale.astype(jnp.float32),
        down_packed, down_scale.astype(jnp.float32),
    )
    return out[:m]
