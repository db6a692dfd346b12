"""Fused MIPS (maximum inner-product search) top-k — the retrieval substrate.

This replaces the reference's torch ``mm`` + ``topk`` loop
(embed_utils.py:8-97) with:

  - ``dense_topk``: single-device jitted matmul + top-k with padded-row
    masking. On TPU the selection uses ``lax.approx_max_k`` (the hardware
    PartialReduce path) by default — exact re-ranking of the candidate set
    is built in via ``aggregate_to_topk``.
  - ``make_sharded_topk``: a ``shard_map`` over the ``corpus`` mesh axis:
    each device scores its corpus shard (MXU matmul), takes a *local* top-k,
    and the per-shard candidates (scores + global row ids) ride ICI via
    ``all_gather`` into a final merge. Wall-clock = one shard's work.

The Pallas fused kernel (matmul + streaming top-k without materializing the
score matrix in HBM) lives in ``ops/pallas_topk.py`` and plugs in as the
per-shard scorer via ``make_sharded_topk(..., method="pallas")``; int8
corpora are supported on every path (sharded XLA, sharded Pallas,
single-device Pallas).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

NEG_INF = -1e30

def _score_dot(queries: jnp.ndarray, corpus_t: jnp.ndarray) -> jnp.ndarray:
    """Query-corpus matmul with fp32 accumulation. fp32 inputs use true
    fp32 MXU passes (Precision.HIGHEST) — the TPU default would silently
    truncate operands to bf16; callers wanting the fast path store the
    corpus in bf16 explicitly (MipsIndex dtype="bfloat16")."""
    precision = (
        jax.lax.Precision.HIGHEST
        if queries.dtype == jnp.float32 and corpus_t.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(queries, corpus_t, preferred_element_type=jnp.float32, precision=precision)




_TWO_STAGE_BLOCK = 128  # one lane row of scores per block


def _exact_topk(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k by value via a block-max prefilter — measured ~25x
    cheaper than ``lax.top_k`` on the full matrix at [16, 100k] (0.012 ms
    vs 0.30 ms added over the scan).

    Stage 1 reduces each 128-wide block to its max and takes the top-k
    BLOCKS; stage 2 gathers those k*128 scores and takes the exact top-k
    within them. Sound: let v_k be the k-th largest score. Fewer than k
    elements exceed v_k, so fewer than k blocks have max > v_k — the
    block top-k keeps all of them, filling remaining slots with max == v_k
    blocks when they exist (each holding >= 1 tied element). The gathered
    union therefore contains every element > v_k plus enough == v_k ties
    to fill k slots, and the within-union top-k is a valid top-k-by-value
    set. Returned values are gathered copies of ``scores`` entries
    (bit-identical); tie ORDER at rank k may differ from lax.top_k's
    lowest-index rule — same exactness contract every consumer already
    assumes (the two-pass certificate only needs "every row outside the
    selection scores <= the selection's min", which holds with ties).

    Falls back to plain ``lax.top_k`` below the crossover size (the
    prefilter needs n >> k*128 to pay for itself) or when fewer than k
    blocks exist."""
    p, n = scores.shape
    nb = -(-n // _TWO_STAGE_BLOCK)
    if n < 2 * k * _TWO_STAGE_BLOCK or k > nb:
        return jax.lax.top_k(scores, k)
    pad = nb * _TWO_STAGE_BLOCK - n
    sb = scores
    if pad:
        sb = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    sb = sb.reshape(p, nb, _TWO_STAGE_BLOCK)
    blk = jax.lax.top_k(jnp.max(sb, axis=2), k)[1]                    # [P, k]
    sub = jnp.take_along_axis(sb, blk[:, :, None], axis=1)            # [P, k, B]
    vals, loc = jax.lax.top_k(sub.reshape(p, k * _TWO_STAGE_BLOCK), k)
    idx = (
        jnp.take_along_axis(blk, loc // _TWO_STAGE_BLOCK, axis=1) * _TWO_STAGE_BLOCK
        + loc % _TWO_STAGE_BLOCK
    )
    return vals, idx


def _select_topk(scores: jnp.ndarray, k: int, exact: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact two-stage/lax top-k or the hardware PartialReduce
    approximation with exact re-ranking of the candidate set."""
    if exact:
        return _exact_topk(scores, k)
    return jax.lax.approx_max_k(scores, k, recall_target=0.95, aggregate_to_topk=True)

def _mask_padded(scores: jnp.ndarray, n_valid: jnp.ndarray, offset: int | jnp.ndarray = 0) -> jnp.ndarray:
    """Set columns whose *global* row id >= n_valid to -inf."""
    n_cols = scores.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1) + offset
    return jnp.where(col_ids < n_valid, scores, NEG_INF)


@functools.partial(jax.jit, static_argnames=("k", "exact"))
def dense_topk(
    queries: jnp.ndarray,  # [P, d]
    corpus: jnp.ndarray,   # [N, d] (rows >= n_valid are padding)
    n_valid: jnp.ndarray,  # scalar int32
    k: int,
    exact: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k inner products of each query against the corpus. Returns
    (scores [P, k], indices [P, k]) sorted descending."""
    scores = _score_dot(queries, corpus.T)
    scores = _mask_padded(scores, n_valid)
    return _select_topk(scores, k, exact)


def _pack(scores: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pack (scores fp32 [P, k], idx int32 [P, k]) into one int32 [P, 2k]
    buffer so the host fetch is a single transfer. The *scores* are the
    bitcast side: small int indices bitcast to fp32 are denormals, which
    the TPU VPU flushes to zero; int32 lanes round-trip exactly."""
    score_bits = jax.lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.int32)
    return jnp.concatenate([score_bits, idx.astype(jnp.int32)], axis=1)



def _int8_scan_dot(queries: jnp.ndarray, corpus_q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """The ONE int8 scan numerics shared by every path (single-device,
    sharded, two-pass, stats): int8 rows upcast to bf16 on the fly (exact
    — |q| <= 127 fits bf16's mantissa; HBM reads stay 1 byte/element),
    fp32-accumulated MXU dot, per-row scales folded into the columns.
    A precision/scaling tweak applied here reaches all consumers at once."""
    s = jnp.dot(
        queries.astype(jnp.bfloat16),
        corpus_q.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return s * scales[None, :]

def make_packed_topk(k: int, exact: bool = True):
    """Jitted single-device top-k returning one packed [P, 2k] buffer."""

    @jax.jit
    def fn(queries, corpus, n_valid):
        scores, idx = dense_topk(queries, corpus, n_valid, k, exact)
        return _pack(scores, idx)

    return fn


def quantize_int8(corpus: jnp.ndarray | "np.ndarray") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization: returns (q [N, d] int8,
    scales [N] f32) with row ≈ q * scale. 4x less HBM than fp32."""
    import numpy as np

    c = np.asarray(corpus, np.float32)
    scales = np.abs(c).max(axis=1) / 127.0
    scales = np.where(scales == 0, 1.0, scales)
    q = np.clip(np.rint(c / scales[:, None]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scales.astype(np.float32))


def _scan_eps(dim: int) -> float:
    """Arithmetic-error allowance per unit ``qnorm * row_norm`` for the
    certified scan + rescore: the query hi/lo bf16 split leaves a relative
    2^-18 residual, and each fp32-accumulated dot (two scan channels, the
    fp32 rescore, the per-row scale fold) contributes at most d*2^-24
    worst-case sequential rounding. 4x covers all of them with margin."""
    return 2.0 ** -18 + 4.0 * dim * 2.0 ** -24


RESIDUAL_FOLD = 256.0  # channel-2 values sit at s1/256 — a power of two,
# so folding it into the (bf16) query copies is EXACT


def quantize_int8_residual(
    corpus: "np.ndarray", block: int = 32768
) -> Tuple["np.ndarray", "np.ndarray", float]:
    """Residual-compensated dual-int8 quantization for the certified
    two-pass scan (replaces the r3 single-channel scan whose pool-max
    error estimate was unsound — VERDICT r3 #1/#3).

    Channel 1 quantizes the row; channel 2 quantizes channel 1's error at
    a FIXED relative step of ``s1/RESIDUAL_FOLD``:

        row ≈ s1 * (q1 + q2 / 256)

    so the residual ``e2`` is bounded per element by ~``s1/512`` — 16
    effective bits at 2 bytes/element HBM (the same bytes as a bf16 scan,
    ~100x tighter). The fixed power-of-two channel-2 step lets the device
    scan run as ONE fused matmul over the feature-concatenated
    ``[N, 2d]`` int8 matrix with the 1/256 folded into the query copies
    (measured 2.8x faster than two separate channel dots, which defeated
    XLA's operand-read fusion).

    Returns ``(cat, s1, bound)``: ``cat`` the [N, 2d] int8 matrix
    ``[q1 | q2]``, ``s1`` the [N] f32 per-row scales, and ``bound`` the
    SOUND per-query exactness-certificate scalar — for any query q and
    row x,

        |true_score - scan_score| <= ||q||_2 * bound

    by Cauchy-Schwarz on the exactly-known residual (max_j ||e2_j||_2,
    computed here in float64) plus the arithmetic terms of ``_scan_eps``.
    The two-pass result is certifiably exact for a query row whenever its
    k-th rescored value clears the scan pool boundary by more than
    ``||q|| * bound`` (ops/topk._exactness_flag).
    """
    import numpy as np

    c32 = np.asarray(corpus, np.float32)
    n, d = c32.shape if c32.ndim == 2 else (c32.shape[0], 1)
    cat = np.empty((n, 2 * d), np.int8)
    s1 = np.empty(n, np.float32)
    beta_max = 0.0  # max_j ||e2_j||_2, exact (f64)
    chi_max = 0.0   # max_j ||s1*(q1 + q2/256)||_2 (what the scan dots)
    for i in range(0, n, block):
        x = c32[i : i + block].astype(np.float64)
        a1 = np.abs(x).max(axis=1) / 127.0
        a1 = np.where(a1 == 0, 1.0, a1)
        a1 = a1.astype(np.float32).astype(np.float64)  # device folds f32
        b1 = np.clip(np.rint(x / a1[:, None]), -127, 127)
        # residual in units of s1/256: in [-128, 128], clipped to int8
        b2 = np.clip(np.rint((x / a1[:, None] - b1) * RESIDUAL_FOLD), -127, 127)
        hat = a1[:, None] * (b1 + b2 / RESIDUAL_FOLD)
        e2 = x - hat
        beta_max = max(beta_max, float(np.sqrt((e2 * e2).sum(axis=1)).max(initial=0.0)))
        chi_max = max(chi_max, float(np.sqrt((hat * hat).sum(axis=1)).max(initial=0.0)))
        cat[i : i + block, :d] = b1.astype(np.int8)
        cat[i : i + block, d:] = b2.astype(np.int8)
        s1[i : i + block] = a1.astype(np.float32)
    bound = beta_max + _scan_eps(d) * max(chi_max, 1e-30)
    return cat, s1, float(bound)


def bf16_scan_corpus(corpus: "np.ndarray") -> Tuple["np.ndarray", float]:
    """bf16 cast of the corpus + its sound certificate ``bound`` (same
    contract as ``quantize_int8_residual``): the cast residual norm is
    exactly computable at build time, ~2^-9 per unit row norm — looser
    than the dual-int8 channel at the same 2 bytes/element."""
    import ml_dtypes
    import numpy as np

    c32 = np.asarray(corpus, np.float32)
    hat16 = c32.astype(ml_dtypes.bfloat16)
    hat = hat16.astype(np.float64)
    e = c32.astype(np.float64) - hat
    beta_max = float(np.sqrt((e * e).sum(axis=1)).max(initial=0.0))
    chi_max = float(np.sqrt((hat * hat).sum(axis=1)).max(initial=0.0))
    d = c32.shape[1] if c32.ndim == 2 else 1
    return hat16, beta_max + _scan_eps(d) * max(chi_max, 1e-30)


@functools.partial(jax.jit, static_argnames=("k", "exact"))
def int8_topk(
    queries: jnp.ndarray,    # [P, d] f32
    corpus_q: jnp.ndarray,   # [N, d] int8
    scales: jnp.ndarray,     # [N] f32
    n_valid: jnp.ndarray,
    k: int,
    exact: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over a quantized corpus: int8 rows upcast on the fly (HBM
    reads 1/4 of fp32), per-row scales folded into the score columns."""
    # int8 -> bf16 converts exactly (|q| <= 127 fits bf16's 8-bit
    # mantissa) and fuses into the dot's operand read, so HBM traffic
    # stays 1 byte/element and the MXU runs single-pass bf16 — the same
    # scan numerics as the Pallas int8 kernel and the sharded path.
    scores = _int8_scan_dot(queries, corpus_q, scales)
    scores = _mask_padded(scores, n_valid)
    return _select_topk(scores, k, exact)


@jax.jit
def int8_scores(queries: jnp.ndarray, corpus_q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Full [P, N] score matrix over a quantized corpus (bf16 MXU dot —
    same numerics as int8_topk and the sharded int8 path)."""
    return _int8_scan_dot(queries, corpus_q, scales)


def make_packed_topk_min(k: int, int8: bool = False):
    """Top-k + per-row masked MIN in one packed [P, 2k+1] buffer.

    The fact-linking path needs only the top ``linking_top_k`` candidates
    plus the row min/max for min-max normalization (row max = the first
    top-k score) — downloading the full [P, F] score matrix for that is
    pure tunnel wire time at 100k+ facts."""

    def _finish(s, n_valid):
        masked = _mask_padded(s, n_valid)
        scores, idx = _select_topk(masked, min(k, s.shape[1]), True)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        row_min = jnp.min(jnp.where(col_ids < n_valid, s, jnp.inf), axis=1, keepdims=True)
        packed_scores = jnp.concatenate([scores, row_min], axis=1)
        bits = jax.lax.bitcast_convert_type(packed_scores.astype(jnp.float32), jnp.int32)
        return jnp.concatenate([bits, idx.astype(jnp.int32)], axis=1)

    if int8:

        @jax.jit
        def fn(queries, corpus_q, scales, n_valid):
            return _finish(int8_scores(queries, corpus_q, scales), n_valid)

    else:

        @jax.jit
        def fn(queries, corpus, n_valid):
            return _finish(_score_dot(queries, corpus.T), n_valid)

    return fn


def make_packed_stats_from_scores(k: int):
    """Top-k + masked row MIN + masked row SUM from a PRECOMPUTED dense
    score buffer, packed into one [P, 2k+2] int32 transfer.

    The probe fan-out's DPR stage consumes only (a) each row's min-max
    normalized SUM (a scalar prior weight), (b) top-k fallback candidates
    — while the dense [P, N] buffer itself must stay ON DEVICE to seed
    the fused PPR prior. Downloading the full matrix for the host
    normalize measured ~93 s of a 32-question QA loop at 200k chunks
    (engine.py dense_ranking span); this reduces it to one small packed
    fetch. Layout: [k score bits | min | sum | k idx]."""

    @jax.jit
    def fn(scores, n_valid):
        k_eff = min(k, scores.shape[1])
        vals, idx = _select_topk(_mask_padded(scores, n_valid), k_eff, True)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
        valid = col_ids < n_valid
        row_min = jnp.min(jnp.where(valid, scores, jnp.inf), axis=1, keepdims=True)
        row_sum = jnp.sum(
            jnp.where(valid, scores, 0.0), axis=1, keepdims=True,
            dtype=jnp.float32,
        )
        packed_scores = jnp.concatenate([vals, row_min, row_sum], axis=1)
        bits = jax.lax.bitcast_convert_type(packed_scores.astype(jnp.float32), jnp.int32)
        return jnp.concatenate([bits, idx.astype(jnp.int32)], axis=1)

    return fn


def make_packed_int8_topk(k: int, exact: bool = True):
    @jax.jit
    def fn(queries, corpus_q, scales, n_valid):
        scores, idx = int8_topk(queries, corpus_q, scales, n_valid, k, exact)
        return _pack(scores, idx)

    return fn


def _certified_scan(queries: jnp.ndarray, scan_mat: jnp.ndarray, scales) -> jnp.ndarray:
    """The certified compressed scan shared by the single-device and
    sharded two-pass — ONE fused matmul:

      - queries split hi/lo into bf16 (the query cast then contributes
        only a 2^-18 relative residual, not bf16's 2^-9) and stacked into
        a [2P, ...] operand, so the corpus is read from HBM exactly once;
      - ``scales`` is not None: ``scan_mat`` is the [rows, 2d] int8
        residual layout from ``quantize_int8_residual`` — the query
        copies are feature-concatenated with an EXACT power-of-two 1/256
        fold ([q, q/256]) so one dot yields q·q1 + q·q2/256, scaled
        per-row afterwards;
      - ``scales`` is None: ``scan_mat`` is a plain [rows, d] bf16 cast.
    """
    p = queries.shape[0]
    q32 = queries.astype(jnp.float32)
    q_hi = q32.astype(jnp.bfloat16)
    q_lo = (q32 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    qs = jnp.concatenate([q_hi, q_lo], axis=0)  # [2P, d]
    if scales is not None:
        qs = jnp.concatenate([qs, qs * jnp.bfloat16(1.0 / RESIDUAL_FOLD)], axis=1)
    dd = jnp.dot(qs, scan_mat.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    s = dd[:p] + dd[p:]
    if scales is not None:
        s = s * scales[None, :]
    return s


def _two_pass_core(
    queries: jnp.ndarray,      # [P, d] fp32
    scan_mat: jnp.ndarray,     # THIS device's scan rows (int8 [rows, 2d]
    scales,                    #   with scales [rows], or bf16 [rows, d])
    corpus_f32: jnp.ndarray,   # [rows, d] fp32 (same rows as scan_mat)
    n_valid,                   # global valid-row count (scalar)
    k: int,
    candidates: int,
    offset=0,                  # global row id of this device's row 0
    local_valid=None,          # valid rows on THIS device (sharded only)
):
    """scan -> pool -> exact fp32 rescore. Returns (rescored [P, k'],
    global idx [P, k'], pool boundary scan value [P], qnorm [P],
    immune [P] bool — rows that can never flag: the pool covered every
    valid row (nothing outside to miss) or the query is all-zero padding)."""
    rows_here = corpus_f32.shape[0]
    c = min(candidates, rows_here)
    s = _mask_padded(_certified_scan(queries, scan_mat, scales), n_valid, offset=offset)
    # consume ONLY the indices of the scan top-k: reading a full-width
    # lax.top_k's values output flips XLA's TPU lowering to a variant
    # measured 2.7x slower end-to-end (0.84 -> 2.24 ms at 100k x 1024);
    # the certificate's pool boundary is recovered bit-identically by a
    # tiny gather from the score matrix the selection already read.
    # _exact_topk's block-max prefilter cuts the selection cost itself
    # ~25x at 100k rows (r4).
    cand = _exact_topk(s, c)[1]
    boundary = jnp.min(jnp.take_along_axis(s, cand, axis=1), axis=1)
    pool = jnp.take(corpus_f32, cand, axis=0)  # [P, C, d] fp32
    exact = jnp.einsum(
        "pd,pcd->pc",
        queries,
        pool,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    exact_m = jnp.where(cand + offset < n_valid, exact, NEG_INF)
    k_local = min(k, c)
    rv, pos = jax.lax.top_k(exact_m, k_local)
    idx = jnp.take_along_axis(cand, pos, axis=1) + offset
    qnorm = jnp.sqrt(jnp.sum(jnp.square(queries.astype(jnp.float32)), axis=1))
    full_cover = c >= (n_valid if local_valid is None else local_valid)
    immune = jnp.logical_or(jnp.broadcast_to(full_cover, qnorm.shape), qnorm == 0)
    return rv, idx, boundary, qnorm, immune


def make_packed_two_pass_topk(k: int, candidates: int, scan: str = "int8"):
    """Two-pass exact top-k: a compressed *scan* (dual-int8 residual
    channels or bf16 — 1/2 the HBM reads of fp32; retrieval is
    HBM-bandwidth-bound) selects ``candidates`` rows per query, then an
    exact fp32 gather+rescore of just those rows picks the final k.

    Exactness is certified PER ROW on device by a sound analytic bound
    (see ``quantize_int8_residual`` / ``_exactness_flag``): a row whose
    k-th rescored value clears the scan pool boundary by more than
    ``||q|| * bound`` provably has its true top-k inside the pool. Rows
    that don't clear it carry a flag and are rescued by the caller with a
    per-row fp32 pass (retrieval/index.TwoPassHandle) — never a whole-
    batch blocking fallback (VERDICT r3 #1/#3).

    Rescore intermediate is [P, candidates, d] fp32 — size the candidate
    count accordingly for very large query buckets.
    """

    @jax.jit
    def fn_int8(queries, scan_cat, scales, corpus_f32, n_valid, bound):
        rv, idx, boundary, qnorm, immune = _two_pass_core(
            queries, scan_cat, scales, corpus_f32, n_valid, k, candidates
        )
        flag = _exactness_flag(boundary, rv[:, -1], qnorm, bound, immune)
        return _pack_flagged(rv, idx, flag)

    @jax.jit
    def fn_bf16(queries, corpus_bf16, corpus_f32, n_valid, bound):
        rv, idx, boundary, qnorm, immune = _two_pass_core(
            queries, corpus_bf16, None, corpus_f32, n_valid, k, candidates
        )
        flag = _exactness_flag(boundary, rv[:, -1], qnorm, bound, immune)
        return _pack_flagged(rv, idx, flag)

    return fn_int8 if scan == "int8" else fn_bf16


def _exactness_flag(
    boundary: jnp.ndarray,    # [P] the c-th (worst) scan score in the pool
    kth_value: jnp.ndarray,   # [P] the k-th best fp32-rescored value that
                              #     the final (merged) result keeps
    qnorm: jnp.ndarray,       # [P] fp32 query L2 norms
    bound,                    # scalar: max-row |true-scan| per unit qnorm
    immune: jnp.ndarray,      # [P] bool: full pool coverage / padding row
) -> jnp.ndarray:
    """[P] int32: 1 when this row's two-pass result is not certifiably
    exact. SOUND: every row outside the scan pool has computed scan score
    <= boundary, and |true - scan| <= qnorm * bound for every row (bound
    is the build-time Cauchy-Schwarz residual bound plus arithmetic
    allowances — quantize_int8_residual / _scan_eps; the rescore's own
    fp32 error is inside the same allowance). So when

        kth_value - boundary > qnorm * bound

    no outside row can beat the value the result keeps at rank k, and the
    result is provably the exact top-k. On a mesh, ``kth_value`` is the
    GLOBAL merged k-th (not the shard-local one): a shard whose pool
    boundary sits below the global k-th by more than the error bound
    cannot hide a winner, however ambiguous its own tail is — this keeps
    an all-duplicates shard from flagging queries it can't affect. The
    dual-int8 residual scan keeps ``bound`` ~1e-4 per unit norm — orders
    below the pool-boundary gap of any non-degenerate corpus — so the
    flag fires only on genuine sub-residual-step ties (exact duplicate/
    boilerplate rows straddling the pool boundary)."""
    ambiguous = kth_value - boundary <= qnorm * bound
    return jnp.where(ambiguous & (~immune), 1, 0).astype(jnp.int32)


def _pack_flagged(scores: jnp.ndarray, idx: jnp.ndarray, flag: jnp.ndarray) -> jnp.ndarray:
    """_pack plus a trailing per-row int32 flag column: [P, 2k + 1]."""
    return jnp.concatenate([_pack(scores, idx), flag[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=())
def dense_scores(queries: jnp.ndarray, corpus: jnp.ndarray) -> jnp.ndarray:
    """Full score matrix [P, N] (used for PPR passage priors, where every
    node needs a weight)."""
    return _score_dot(queries, corpus.T)


def make_sharded_topk(
    mesh: Mesh,
    k: int,
    axis: str = "corpus",
    exact: bool = True,
    packed: bool = False,
    method: str = "xla",
    int8: bool = False,
    interpret: bool = False,
    tile_n: int = 512,
):
    """Build a jitted sharded top-k: corpus sharded row-wise on ``axis``,
    queries replicated, output replicated.

    The returned fn takes (queries [P, d], corpus [N_pad, d], n_valid) —
    or (queries, corpus_q int8, scales [N_pad], n_valid) when ``int8`` —
    with N_pad divisible by the axis size.

    ``method="pallas"`` runs the fused streaming kernel
    (ops/pallas_topk.py) as the per-shard scorer: the [P, rows] score
    block never hits HBM on any shard; per-shard candidates still ride
    ICI via ``all_gather`` into the global merge. Pallas shards need
    tile-aligned rows (512). ``interpret=True`` evaluates the kernel on
    CPU for mesh tests without a TPU.
    """

    def _local_topk(queries, corpus_shard, scales_shard, n_valid):
        # corpus_shard: [N_pad / n_shards, d] — this device's rows.
        shard_rows = corpus_shard.shape[0]
        my_shard = jax.lax.axis_index(axis)
        offset = my_shard * shard_rows
        # k may exceed a shard's rows (e.g. synonymy_edge_topk=2047 over
        # small shards): each shard contributes ALL its rows then, and the
        # global merge still sees every global top-k candidate.
        local_k = min(k, shard_rows)
        if method == "pallas":
            from comorag_tpu.ops.pallas_topk import (
                pallas_mips_topk,
                pallas_mips_topk_int8,
            )

            n_local = jnp.clip(n_valid - offset, 0, shard_rows)
            if int8:
                local_scores, local_idx = pallas_mips_topk_int8(
                    queries, corpus_shard, scales_shard.reshape(1, -1),
                    n_local, local_k, tile_n=tile_n, interpret=interpret,
                )
            else:
                local_scores, local_idx = pallas_mips_topk(
                    queries, corpus_shard, n_local, local_k, tile_n=tile_n,
                    interpret=interpret,
                )
        else:
            if int8:
                scores = _int8_scan_dot(queries, corpus_shard, scales_shard)
            else:
                scores = _score_dot(queries, corpus_shard.T)
            scores = _mask_padded(scores, n_valid, offset=offset)
            local_scores, local_idx = _select_topk(scores, local_k, exact)
        local_idx = local_idx + offset
        # Candidates ride ICI: [P, n_shards * local_k] on every device.
        all_scores = jax.lax.all_gather(local_scores, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(local_idx, axis, axis=1, tiled=True)
        merged_scores, merged_pos = jax.lax.top_k(all_scores, min(k, all_scores.shape[1]))
        merged_idx = jnp.take_along_axis(all_idx, merged_pos, axis=1)
        return merged_scores, merged_idx

    if int8:
        sharded = shard_map(
            _local_topk,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    else:
        def _local3(queries, corpus_shard, n_valid):
            return _local_topk(queries, corpus_shard, None, n_valid)

        sharded = shard_map(
            _local3,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    if not packed:
        return jax.jit(sharded)

    @jax.jit
    def fn(*args):
        scores, idx = sharded(*args)
        return _pack(scores, idx)

    return fn


def make_sharded_two_pass_topk(
    mesh: Mesh,
    k: int,
    candidates: int,
    axis: str = "corpus",
    scan: str = "int8",
):
    """Sharded exact two-pass top-k: per-shard compressed scan -> local
    fp32 gather+rescore -> ICI merge (VERDICT r2 task #1).

    Every device scans ITS corpus rows compressed (dual-int8 residual
    channels or bf16 — 1/2 the HBM reads of fp32; retrieval is
    bandwidth-bound), picks its local top-``candidates``, rescores just
    those rows from its *local* fp32 shard (the gather never crosses
    devices), and takes a local exact top-k. Per-shard winners then ride
    ICI via ``all_gather`` into the global merge — identical merge
    topology to ``make_sharded_topk``.

    Exactness: per-shard local-top-k ⊆ local-scan-top-C is the same
    margin property as the single-device two-pass, but applied to 1/n of
    the rows per shard, so the sharded path is *more* robust at equal C.

    Replaces the reference's single-device torch scan (embed_utils.py:8-97)
    at any device count.

    int8 signature: (queries [P,d] f32, scan_cat [N_pad,2d] int8 sharded,
    scales [N_pad] f32 sharded, corpus_f32 [N_pad,d] f32 sharded,
    n_valid, bound). bf16 signature: (queries, corpus_bf16 sharded,
    corpus_f32 sharded, n_valid, bound). ``bound`` is the certificate
    scalar from ``quantize_int8_residual`` / ``bf16_scan_corpus``; flags
    stay PER ROW across shards (elementwise pmax — a row is ambiguous iff
    ANY shard's pool boundary reaches the merged k-th), so the caller
    rescues only the flagged rows, not the whole batch.
    """

    def _local(queries, scan_shard, scales_shard, f32_shard, n_valid, bound):
        shard_rows = f32_shard.shape[0]
        my_shard = jax.lax.axis_index(axis)
        offset = my_shard * shard_rows
        # the shard's own valid-row count bounds full pool coverage
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        local_scores, local_idx, boundary, qnorm, immune = _two_pass_core(
            queries, scan_shard, scales_shard, f32_shard, n_valid, k, candidates,
            offset=offset, local_valid=local_valid,
        )
        all_scores = jax.lax.all_gather(local_scores, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(local_idx, axis, axis=1, tiled=True)
        merged_scores, merged_pos = jax.lax.top_k(all_scores, min(k, all_scores.shape[1]))
        merged_idx = jnp.take_along_axis(all_idx, merged_pos, axis=1)
        # certificate per shard against the GLOBAL merged k-th (see
        # _exactness_flag): a shard can only hide a winner if its pool
        # boundary reaches the value the merged result keeps at rank k
        flag = _exactness_flag(boundary, merged_scores[:, -1], qnorm, bound, immune)
        flag = jax.lax.pmax(flag, axis)  # per-row OR across shards
        return _pack_flagged(merged_scores, merged_idx, flag)

    if scan == "int8":
        sharded = shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis), P(axis, None), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sharded)

    def _local_bf16(queries, scan_shard, f32_shard, n_valid, bound):
        return _local(queries, scan_shard, None, f32_shard, n_valid, bound)

    sharded = shard_map(
        _local_bf16,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_topk_min(mesh: Mesh, k: int, axis: str = "corpus", int8: bool = False):
    """Sharded twin of ``make_packed_topk_min``: per-shard exact scoring
    -> local top-k + local masked min -> ICI merge -> ONE packed
    [P, 2k+1] buffer (scores, global row min, ids).

    Closes the r2 gap where a sharded fact index forced the engine to
    download the full [B, F] score matrix (~72 MB at 282k facts) just to
    min-max-normalize and pick ``linking_top_k`` candidates
    (engine.py fact-linking fetch; reference ComoRAG.py:937-967)."""

    def _local(queries, corpus_shard, scales_shard, n_valid):
        shard_rows = corpus_shard.shape[0]
        my_shard = jax.lax.axis_index(axis)
        offset = my_shard * shard_rows
        if int8:
            s = _int8_scan_dot(queries, corpus_shard, scales_shard)
        else:
            s = _score_dot(queries, corpus_shard.T)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1) + offset
        valid = col_ids < n_valid
        masked = jnp.where(valid, s, NEG_INF)
        local_k = min(k, shard_rows)
        local_scores, local_idx = _exact_topk(masked, local_k)
        local_idx = local_idx + offset
        # all-padding shards contribute +inf, which the global min ignores
        local_min = jnp.min(jnp.where(valid, s, jnp.inf), axis=1, keepdims=True)
        all_scores = jax.lax.all_gather(local_scores, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(local_idx, axis, axis=1, tiled=True)
        row_min = jax.lax.pmin(local_min, axis)
        merged_scores, pos = jax.lax.top_k(all_scores, min(k, all_scores.shape[1]))
        merged_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        packed_scores = jnp.concatenate([merged_scores, row_min], axis=1)
        bits = jax.lax.bitcast_convert_type(packed_scores.astype(jnp.float32), jnp.int32)
        return jnp.concatenate([bits, merged_idx.astype(jnp.int32)], axis=1)

    if int8:
        sharded = shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sharded)

    def _local3(queries, corpus_shard, n_valid):
        return _local(queries, corpus_shard, None, n_valid)

    sharded = shard_map(
        _local3,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_scores(mesh: Mesh, axis: str = "corpus", int8: bool = False):
    """Full [P, N_pad] score matrix with corpus sharded on ``axis``; output
    sharded on its column axis (gathered to host by the caller if needed)."""

    if int8:
        def _local_q(queries, corpus_shard, scales_shard):
            return _int8_scan_dot(queries, corpus_shard, scales_shard)

        sharded = shard_map(
            _local_q,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis)),
            out_specs=P(None, axis),
            check_vma=False,
        )
        return jax.jit(sharded)

    def _local(queries, corpus_shard):
        return _score_dot(queries, corpus_shard.T)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(sharded)
