"""Pallas fused MIPS top-k kernel.

Streams the corpus through VMEM tile by tile, computes the query-tile
score block on the MXU, and maintains the exact running top-k per query in
VMEM scratch — the [P, N] score matrix is never materialized in HBM
(the XLA path writes it out and reads it back for ``lax.top_k``).

Neither ``lax.top_k`` nor ``lax.sort`` lower inside Pallas TPU kernels,
so selection is done by K rounds of vectorized argmax-extraction over a
[P, K + T] candidate buffer (running best ‖ current tile's scores):

  round j:  m   = row-max(cand)                     (VPU reduce)
            pos = first column attaining m          (iota + min trick)
            emit (m, candidate id at pos) into slot j
            mask pos to -inf

Ties resolve to the lowest global row id — matching ``jax.lax.top_k``
(candidates are ordered: previous best (ascending ids), then tile columns
in ascending id order, and extraction takes the *first* maximum).

Replaces the reference's torch ``mm``+``topk`` retrieval loop
(embed_utils.py:8-97) for both query-time dense retrieval and the
synonymy-edge KNN sweep (ComoRAG.py:670-712) where the query batch is
large and the HBM saving matters most.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

NEG_INF = -1e30
_BIG_I = 2**30  # plain int: a jnp scalar would be a captured device constant


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _extract_topk(cand_s, cand_i, k: int):
    """K rounds of argmax extraction. cand_s [P, C] fp32, cand_i [P, C]
    int32. Returns (scores [P, k] desc, ids [P, k])."""
    p, c = cand_s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (p, c), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)

    def round_j(j, carry):
        cand_s, out_s, out_i = carry
        m = jnp.max(cand_s, axis=1, keepdims=True)  # [P, 1]
        ismax = cand_s >= m
        pos = jnp.min(jnp.where(ismax, col, _BIG_I), axis=1, keepdims=True)  # [P, 1]
        onehot = col == pos
        ival = jnp.sum(jnp.where(onehot, cand_i, 0), axis=1, keepdims=True)  # [P, 1]
        out_s = jnp.where(out_col == j, m, out_s)
        out_i = jnp.where(out_col == j, ival, out_i)
        cand_s = jnp.where(onehot, NEG_INF, cand_s)
        return cand_s, out_s, out_i

    out_s = jnp.full((p, k), NEG_INF, jnp.float32)
    out_i = jnp.zeros((p, k), jnp.int32)
    _, out_s, out_i = jax.lax.fori_loop(0, k, round_j, (cand_s, out_s, out_i))
    return out_s, out_i


def _mips_kernel(n_valid_ref, q_ref, c_ref, out_s_ref, out_i_ref, best_s, best_i, *, k: int, tile_n: int):
    t = pl.program_id(1)  # corpus-tile index (innermost)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    # [P_blk, T] score block on the MXU; fp32 accumulation.
    q = q_ref[:]
    c = c_ref[:]
    dn = (((1,), (1,)), ((), ()))
    if q.dtype == jnp.float32 and c.dtype == jnp.float32:
        # fp32 operands: the MXU truncates to bf16 per pass and
        # Precision.HIGHEST stalls Mosaic here, so emulate fp32 with the
        # bf16x3 split: x = hi + lo, x·y ≈ hi·hi + hi·lo + lo·hi.
        qh = q.astype(jnp.bfloat16)
        ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        ch = c.astype(jnp.bfloat16)
        cl = (c - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        scores = (
            jax.lax.dot_general(qh, ch, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(qh, cl, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ql, ch, dn, preferred_element_type=jnp.float32)
        )
    else:
        scores = jax.lax.dot_general(q, c, dn, preferred_element_type=jnp.float32)
    p_blk = scores.shape[0]
    offset = t * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (p_blk, tile_n), 1) + offset
    scores = jnp.where(col_ids < n_valid_ref[0], scores, NEG_INF)

    cand_s = jnp.concatenate([best_s[:], scores], axis=1)
    cand_i = jnp.concatenate([best_i[:], col_ids], axis=1)
    top_s, top_i = _extract_topk(cand_s, cand_i, k)
    best_s[:] = top_s
    best_i[:] = top_i

    @pl.when(t == n_tiles - 1)
    def _():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "block_p", "interpret"))
def pallas_mips_topk(
    queries: jnp.ndarray,  # [P, d] (P multiple of 8)
    corpus: jnp.ndarray,   # [N_pad, d] (N_pad multiple of tile_n)
    n_valid: jnp.ndarray,  # scalar int32
    k: int,
    tile_n: int = 512,
    block_p: int = 128,
    interpret: bool = False,  # CPU-testable interpreter mode
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner products, fused matmul + streaming selection.
    Returns (scores [P, k] desc, indices [P, k])."""
    p, d = queries.shape
    n_pad = corpus.shape[0]
    assert n_pad % tile_n == 0, (n_pad, tile_n)
    k_pad = _round_up(k, 8)
    # largest sublane-aligned block that divides the (8-aligned) batch
    block_p = min(block_p, 128)
    while block_p > 8 and p % block_p:
        block_p //= 2
    assert p % block_p == 0, (p, block_p)

    grid = (p // block_p, n_pad // tile_n)
    out_s, out_i = pl.pallas_call(
        functools.partial(_mips_kernel, k=k_pad, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid (scalar)
            pl.BlockSpec((block_p, d), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_p, k_pad), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, k_pad), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((p, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_p, k_pad), jnp.float32),
            pltpu.VMEM((block_p, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p * n_pad * d,
            bytes_accessed=n_pad * d * corpus.dtype.itemsize + p * d * 4 + 2 * p * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), queries, corpus)
    return out_s[:, :k], out_i[:, :k]


def _mips_kernel_int8(
    n_valid_ref, q_ref, c_ref, s_ref, out_s_ref, out_i_ref, best_s, best_i, *, k: int, tile_n: int
):
    """int8-corpus variant: rows dequantize via per-row scales AFTER the
    bf16 MXU dot (int8 values convert to bf16 exactly), so HBM reads stay
    1 byte/element."""
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:].astype(jnp.bfloat16)
    c = c_ref[:].astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    scores = jax.lax.dot_general(q, c, dn, preferred_element_type=jnp.float32)
    scores = scores * s_ref[:]  # [1, T] broadcasts over the query block
    p_blk = scores.shape[0]
    offset = t * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (p_blk, tile_n), 1) + offset
    scores = jnp.where(col_ids < n_valid_ref[0], scores, NEG_INF)

    cand_s = jnp.concatenate([best_s[:], scores], axis=1)
    cand_i = jnp.concatenate([best_i[:], col_ids], axis=1)
    top_s, top_i = _extract_topk(cand_s, cand_i, k)
    best_s[:] = top_s
    best_i[:] = top_i

    @pl.when(t == n_tiles - 1)
    def _():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "block_p", "interpret"))
def pallas_mips_topk_int8(
    queries: jnp.ndarray,   # [P, d] fp32/bf16 (P multiple of 8)
    corpus_q: jnp.ndarray,  # [N_pad, d] int8 (N_pad multiple of tile_n)
    scales: jnp.ndarray,    # [1, N_pad] fp32 per-row dequant scales
    n_valid: jnp.ndarray,
    k: int,
    tile_n: int = 512,
    block_p: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused streaming top-k over an int8-quantized corpus (1/4 the HBM
    reads of fp32). Scores match the XLA int8 path (ops/topk.int8_topk)."""
    p, d = queries.shape
    n_pad = corpus_q.shape[0]
    assert n_pad % tile_n == 0, (n_pad, tile_n)
    assert scales.shape == (1, n_pad), (scales.shape, n_pad)
    k_pad = _round_up(k, 8)
    block_p = min(block_p, 128)
    while block_p > 8 and p % block_p:
        block_p //= 2
    assert p % block_p == 0, (p, block_p)

    grid = (p // block_p, n_pad // tile_n)
    out_s, out_i = pl.pallas_call(
        functools.partial(_mips_kernel_int8, k=k_pad, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_p, d), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_p, k_pad), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, k_pad), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((p, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_p, k_pad), jnp.float32),
            pltpu.VMEM((block_p, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p * n_pad * d,
            bytes_accessed=n_pad * d + p * d * 4 + n_pad * 4 + 2 * p * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), queries, corpus_q, scales)
    return out_s[:, :k], out_i[:, :k]


def mips_topk_host(queries: np.ndarray, corpus_padded: jnp.ndarray, n: int, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience host wrapper: pads queries to sublane multiples, clips k."""
    queries = np.atleast_2d(np.asarray(queries, np.float32))
    p = queries.shape[0]
    p_pad = _round_up(p, 8)
    q = np.zeros((p_pad, queries.shape[1]), np.float32)
    q[:p] = queries
    k_eff = min(k, n)
    s, i = pallas_mips_topk(jnp.asarray(q), corpus_padded, jnp.asarray(n, jnp.int32), k_eff)
    return np.asarray(s)[:p, :k_eff], np.asarray(i)[:p, :k_eff].astype(np.int64)
