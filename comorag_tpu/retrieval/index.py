"""Host-facing MIPS index over one embedding matrix.

One ``MipsIndex`` per memory layer (veridical chunks, facts, entities,
semantic summaries, episodic timeline). It owns:

  - padding to tile/shard boundaries (XLA static shapes),
  - placement: replicated on one device, or row-sharded over the mesh's
    ``corpus`` axis when a mesh is supplied,
  - scoring dtype: fp32, or bf16 storage with fp32 MXU accumulation
    (halves HBM traffic — the retrieval bottleneck),
  - query-batch bucketing so the jit cache stays small across the meta
    loop's variable probe fan-out,
  - a *pipelined* host protocol: every query launch is async, the top-k
    scores+indices are packed into ONE device buffer, and the host copy is
    started eagerly (``copy_to_host_async``) so device→host latency
    overlaps with the next launch.  On a remote-attached TPU a blocking
    round-trip costs tens of ms; the async protocol turns N sequential
    syncs into one pipeline drain.

This is the TPU-native replacement for the reference's per-call
numpy/torch matmuls (ComoRAG.py:937-967, embed_utils.py:8-97).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from comorag_tpu.ops.topk import (
    bf16_scan_corpus,
    dense_scores,
    int8_scores as _int8_scores,
    make_packed_int8_topk,
    make_packed_topk,
    make_packed_two_pass_topk,
    make_sharded_scores,
    make_sharded_topk,
    make_sharded_topk_min,
    make_sharded_two_pass_topk,
    quantize_int8,
    quantize_int8_residual,
)
from comorag_tpu.utils import trace
from comorag_tpu.utils.logging import get_logger

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

logger = get_logger(__name__)

_QUERY_BUCKETS = (1, 4, 8, 16, 32, 64, 128, 256)

# Adaptive two-pass margin knobs: grow when a batch rescues more than
# _TIE_RATE_GROW of its rows; give up on the scan (fp32 fallback) when the
# margin is maxed and more than _TIE_RATE_OFF still rescues. The max keeps
# the candidate pool in the regime where lax.top_k cost hasn't erased the
# scan's bandwidth win (C=256 ~= fp32 single-pass, PERF.md).
_TIE_MARGIN_MAX = 192
_TIE_RATE_GROW = 0.02
_TIE_RATE_OFF = 0.20


def _bucket(n: int) -> int:
    for b in _QUERY_BUCKETS:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _start_host_copy(arr) -> None:
    try:
        arr.copy_to_host_async()
    except Exception:  # pragma: no cover - platform without async copies
        pass


class TopkHandle:
    """An in-flight top-k query: device work + host copy already started.

    ``result()`` blocks only on this handle's own transfer; independent
    handles pipeline freely.
    """

    def __init__(self, packed: jax.Array, p: int, k: int):
        self._packed = packed
        self._p = p
        self._k = k
        _start_host_copy(packed)

    def prepare(self) -> None:
        """Hook for pipelined drains (no-op here; see TwoPassHandle)."""

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        packed = np.asarray(self._packed)  # int32 [P, 2*k_pad]
        k_pad = packed.shape[1] // 2
        scores = packed[:, :k_pad].view(np.float32)[: self._p, : self._k]
        idx = packed[: self._p, k_pad : k_pad + self._k].astype(np.int64)
        return scores, idx


class TwoPassHandle:
    """In-flight two-pass top-k ([P, 2k+1] packed: scores, idx, per-row
    exactness flag). A flagged row (its k-th rescored value did not clear
    the scan pool boundary by the sound error bound — genuine
    duplicate/boilerplate ties at the boundary) is rescued by ONE
    additional fp32 single-pass over JUST the flagged rows, dispatched
    asynchronously by ``prepare()``; unflagged rows keep the certified
    two-pass result as-is. Pipelined drains (``topk_many``) call
    ``prepare()`` on every handle before resolving any, so rescue
    round-trips overlap with the rest of the drain instead of serializing
    inside ``result()`` (VERDICT r3 #1/#3)."""

    def __init__(self, packed: jax.Array, p: int, k: int, rescue, on_rate=None):
        self._packed = packed
        self._p = p
        self._k = k
        self._rescue = rescue  # rows -> TopkHandle (fp32 exact, async)
        self._on_rate = on_rate  # index feedback: fraction of rows rescued
        self._rescue_state: Optional[Tuple[np.ndarray, TopkHandle]] = None
        self._host: Optional[np.ndarray] = None
        _start_host_copy(packed)

    def _fetch(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self._packed)
            self._packed = None  # release the device buffer
        return self._host

    def prepare(self) -> None:
        """Fetch this handle's packed buffer (its copy is already in
        flight) and LAUNCH the per-row fp32 rescue for any flagged rows —
        without blocking on the rescue itself."""
        if self._rescue_state is not None:
            return
        packed = self._fetch()
        rows = np.nonzero(packed[: self._p, -1])[0]
        trace.count("two_pass.batches")
        if self._on_rate is not None:
            self._on_rate(rows.size / max(self._p, 1))
        if rows.size:
            trace.count("two_pass.rescued_batches")
            trace.count("two_pass.rescued_rows", int(rows.size))
            logger.debug(
                "two-pass: exactness certificate flagged %d/%d rows — "
                "per-row fp32 rescue dispatched", int(rows.size), self._p,
            )
            self._rescue_state = (rows, self._rescue(rows))
        else:
            self._rescue_state = (rows, None)

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        self.prepare()
        packed = self._fetch()
        k_pad = (packed.shape[1] - 1) // 2
        scores = packed[:, :k_pad].view(np.float32)[: self._p, : self._k]
        idx = packed[: self._p, k_pad : k_pad + self._k].astype(np.int64)
        rows, handle = self._rescue_state
        if handle is not None:
            r_scores, r_idx = handle.result()
            scores = scores.copy()
            scores[rows] = r_scores
            idx[rows] = r_idx  # astype above already made idx writable
        return scores, idx


class _SharedHandle:
    """One coalesced dispatch shared by several fan-out batches
    (``topk_many`` group coalescing): caches the inner handle's resolved
    (scores, idx) so each per-batch slice view resolves it exactly once."""

    def __init__(self, inner: TopkHandle):
        self._inner = inner
        self._out: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def prepare(self) -> None:
        self._inner.prepare()

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._out is None:
            self._out = self._inner.result()
        return self._out


class _SliceHandle:
    """Row-slice view [lo, hi) of a coalesced group's result — the same
    (scores, idx) the batch would have gotten from its own dispatch (the
    scan, rescore, and per-row certificate are all row-independent)."""

    def __init__(self, shared: _SharedHandle, lo: int, hi: int):
        self._shared = shared
        self._lo = lo
        self._hi = hi

    def prepare(self) -> None:
        self._shared.prepare()

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        scores, idx = self._shared.result()
        # copies, not views: per-batch dispatch returns independently-backed
        # arrays, so a caller mutating one batch's result must not corrupt
        # sibling batches sliced from the same shared group buffer
        return (
            scores[self._lo : self._hi].copy(),
            idx[self._lo : self._hi].copy(),
        )


class TopkMinHandle:
    """In-flight top-k + row-min query ([P, 2k+1] packed buffer): the
    fact-linking fetch (candidates + min-max stats) in ONE transfer."""

    def __init__(self, packed: jax.Array, p: int, k: int):
        self._packed = packed
        self._p = p
        self._k = k
        _start_host_copy(packed)

    def result(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(scores [P, k] desc, idx [P, k], row_min [P])."""
        packed = np.asarray(self._packed)
        k_pad = packed.shape[1] // 2  # layout: k_pad scores, 1 min, k_pad idx
        scores = packed[:, :k_pad].view(np.float32)[: self._p, : self._k]
        row_min = packed[:, k_pad : k_pad + 1].view(np.float32)[: self._p, 0]
        idx = packed[: self._p, k_pad + 1 : k_pad + 1 + self._k].astype(np.int64)
        return scores, idx, row_min


class MipsIndex:
    def __init__(
        self,
        matrix: np.ndarray,  # [N, d] float32 (host)
        mesh: Optional[Mesh] = None,
        axis: str = "corpus",
        min_rows_per_shard: int = 256,
        dtype: str = "float32",  # "float32" | "bfloat16" | "int8" storage/scoring
        method: str = "xla",  # "xla" | "pallas" (fused streaming kernel)
        scan_dtype: Optional[str] = "auto",  # "auto" | "int8" | "bfloat16" | None: two-pass scan+exact-rescore
        scan_candidates: Optional[int] = None,  # rescore pool per query (default max(8k, 512))
        tile_n: int = 512,  # Pallas corpus rows per tile (ComoConfig.topk_block_rows)
    ):
        self.n = int(matrix.shape[0])
        self.dim = int(matrix.shape[1]) if matrix.ndim == 2 and matrix.shape[1] else 1
        self.axis = axis
        self.int8 = dtype == "int8"  # 4x corpus capacity; approximate scores
        self.dtype = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else jnp.float32
        # "auto" (the ComoConfig default since r3): an fp32 XLA index
        # auto-selects the exact int8-scan two-pass — it is strictly
        # better than single-pass fp32 (exact results, ~2.3x throughput,
        # BENCH_r02 detail) — once the corpus is big enough that the scan
        # actually saves bytes (tiny corpora would just rescore everything).
        self._scan_auto = scan_dtype == "auto"
        # "auto" is resolved AFTER the effective method is known (below):
        # a pallas request downgraded to XLA must still get the two-pass
        self._scan_request = scan_dtype
        self.scan_candidates = scan_candidates

        # a mesh without this index's axis (e.g. a pure data-parallel
        # encode mesh) means "don't shard the corpus" — not an error
        n_shards = mesh.shape.get(axis, 1) if mesh is not None else 1
        # Sharding tiny layers wastes ICI latency; keep them single-device.
        self.mesh = (
            mesh
            if (mesh is not None and n_shards > 1 and self.n >= n_shards * min_rows_per_shard)
            else None
        )
        self.n_shards = n_shards if self.mesh is not None else 1
        # The Pallas kernel composes with meshes (per-shard scorer) and
        # int8 (pallas_mips_topk_int8), but needs a real TPU backend —
        # tests exercise it via interpret mode / make_sharded_topk directly.
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        self.method = method if (method == "pallas" and self.n >= 512 and on_tpu) else "xla"

        pad_to = max(8, self.n_shards * 8)
        # Mosaic tiling: the corpus tile's sublane dim must be a multiple
        # of 32 (int8 kernel; fp32 needs 8) — round up, don't just floor
        self.tile_n = max(32, ((int(tile_n) + 31) // 32) * 32)
        if self.method == "pallas":
            # every shard's rows must be tile-aligned for the kernel grid
            pad_to = self.tile_n * max(1, self.n_shards)
        self.n_pad = max(_round_up(max(self.n, 1), pad_to), self.n_shards * 8)
        padded = np.zeros((self.n_pad, self.dim), dtype=np.float32)
        if self.n:
            padded[: self.n] = matrix

        self._packed_topk_cache: Dict[Tuple, object] = {}
        self._sharded_topk_cache: Dict[Tuple, object] = {}
        self.n_valid = jnp.asarray(self.n, jnp.int32)
        # Adaptive two-pass pool margin (VERDICT r4 #4). Boundary-tie
        # density is a property of the QUERY x CORPUS interaction (the
        # 200k-entity synonymy sweep ties below 16-bit scan precision on
        # near-duplicate clusters; random corpora don't), so it can't be
        # sized at build time — instead the observed per-batch rescue rate
        # feeds back: > _TIE_RATE_GROW of rows rescued doubles the extra
        # candidate margin (quantized doubling keeps the jit-cache zoo to
        # ~4 programs, persistent-cached). If the margin maxes out and
        # rescues persist, THIS index falls back to single-pass fp32 —
        # the demoted successor of the old global large-P auto-route.
        # Races from concurrent query threads are benign (int writes).
        self._tie_margin = 0
        self._scan_off = False

        if self.int8:
            corpus_q, scales = quantize_int8(padded)
            if self.mesh is not None:
                self.corpus = jax.device_put(corpus_q, NamedSharding(self.mesh, P(axis, None)))
                self.scales = jax.device_put(scales, NamedSharding(self.mesh, P(axis)))
                self._sharded_scores = make_sharded_scores(self.mesh, axis, int8=True)
            else:
                self.corpus, self.scales = corpus_q, scales
        else:
            host = padded.astype(self.dtype) if self.dtype == jnp.bfloat16 else padded
            if self.mesh is not None:
                sharding = NamedSharding(self.mesh, P(axis, None))
                self.corpus = jax.device_put(host, sharding)
                self._sharded_scores = make_sharded_scores(self.mesh, axis)
            else:
                self.corpus = jax.device_put(host)

        # Two-pass serving path (fp32 XLA method, single-device OR
        # corpus-sharded): a compressed scan copy rides next to the exact
        # fp32 matrix (+50% HBM either way: dual-int8 residual channels or
        # bf16 are both 2 bytes/element) so the hot scan reads 1/2 the
        # bytes while results stay exact after the fp32 rescore, CERTIFIED
        # per row by a sound build-time bound (quantize_int8_residual /
        # _exactness_flag — VERDICT r3 #1). Under a mesh all copies shard
        # row-wise and the rescore gather stays shard-local
        # (make_sharded_two_pass_topk).
        scan_dtype = self._scan_request
        if scan_dtype == "auto":
            # resolved against the EFFECTIVE self.method, not the request
            scan_dtype = (
                "int8" if (dtype == "float32" and self.method != "pallas" and self.n >= 1024) else None
            )
        self.scan_dtype = scan_dtype if (scan_dtype and dtype == "float32") else None
        if self.scan_dtype and (self.method == "pallas" or self.dtype != jnp.float32):
            logger.warning("scan_dtype=%s needs the fp32 XLA path; disabled", self.scan_dtype)
            self.scan_dtype = None
        if self.scan_dtype == "int8":
            cat, s1, bound = quantize_int8_residual(padded)
            if self.mesh is not None:
                self.scan_corpus = jax.device_put(cat, NamedSharding(self.mesh, P(axis, None)))
                self.scan_scales = jax.device_put(s1, NamedSharding(self.mesh, P(axis)))
            else:
                self.scan_corpus = jnp.asarray(cat)
                self.scan_scales = jnp.asarray(s1)
            # traced arg (not a closure constant): keeps the jitted HLO —
            # and the persistent compile cache — corpus-independent
            self.scan_bound = jnp.asarray(bound, jnp.float32)
        elif self.scan_dtype in ("bfloat16", "bf16"):
            self.scan_dtype = "bfloat16"
            host_bf16, bound = bf16_scan_corpus(padded)
            if self.mesh is not None:
                self.scan_corpus = jax.device_put(
                    host_bf16, NamedSharding(self.mesh, P(axis, None))
                )
            else:
                self.scan_corpus = jax.device_put(host_bf16)
            self.scan_scales = None
            self.scan_bound = jnp.asarray(bound, jnp.float32)

    # ------------------------------------------------------------------ topk
    def _prep_queries(self, queries) -> Tuple[jnp.ndarray, int]:
        target = jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32
        p_min = 8 if self.method == "pallas" else 1  # sublane-aligned blocks
        if isinstance(queries, jax.Array):
            # device-resident queries (e.g. straight off the JAX encoder's
            # pooled output) skip the host->device upload entirely — the
            # TPU-first serving handoff; pad/cast dispatch asynchronously
            q = jnp.atleast_2d(queries)
            p = q.shape[0]
            p_pad = max(_bucket(p), p_min)
            if q.dtype != target:
                q = q.astype(target)
            if p_pad != p:
                q = jnp.pad(q, ((0, p_pad - p), (0, 0)))
            return q, p
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        p = queries.shape[0]
        p_pad = max(_bucket(p), p_min)
        q_pad = np.zeros((p_pad, self.dim), np.float32)
        q_pad[:p] = queries
        return jnp.asarray(q_pad.astype(self.dtype) if self.dtype == jnp.bfloat16 else q_pad), p

    def topk_async(
        self, queries: np.ndarray, k: int, exact: bool = True, _prepped=None,
        _force_fp32: bool = False,
    ) -> TopkHandle:
        """Launch top-k and start the host copy; returns a TopkHandle.
        ``queries`` may be [d] or [P, d]. k is clipped to N."""
        q_dev, p = _prepped if _prepped is not None else self._prep_queries(queries)
        if self.n == 0:
            return _EmptyHandle(p)
        k_eff = min(k, self.n)
        # k may exceed a shard's rows; make_sharded_topk clamps per shard
        # and merges globally, so only the total padded rows bound k here.
        k_pad = min(_round_up(k_eff, 8), self.n_pad)
        k_pad = max(k_pad, k_eff)

        # Two-pass routing. "auto" keeps the single-pass exact path for
        # large k: the candidate pool c tracks k and top_k cost grows
        # steeply with c (measured C=64 -> 23.5k qps, C=128 -> 13.7k,
        # C=256 -> 8.7k ~= fp32 single-pass at 100k x 1024). The old
        # large-query-bucket fp32 route (r4 commit 0bff4eb) is gone: its
        # real trigger was the 200k-entity synonymy sweep rescuing EVERY
        # 1000-row batch through the fixed k+8 margin (near-duplicate
        # boundary ties below 16-bit scan precision) — the ADAPTIVE
        # margin below now absorbs that (r5: the sweep keeps the
        # compressed-scan win, scripts/exp_synonymy_stage.py), and the
        # intrinsic large-P gap on random data is only ~1.1x while an
        # adapted index is ~2x the other way on tie-dense ones. An index
        # whose margin maxes out and still rescues falls back to fp32
        # (self._scan_off, set by _note_rescue_rate).
        c_cap = self.n_pad // self.n_shards if self.mesh is not None else self.n_pad
        base_c = max(self.scan_candidates or 0, _round_up(k_pad + 8, 8), 64)
        c = min(base_c + (self._tie_margin if self._scan_auto else 0), c_cap)
        use_scan = (
            bool(self.scan_dtype)
            # the large-k route checks the BASE pool: a margin grown to
            # avoid rescue storms is allowed past it (rescue dispatches
            # cost far more than the wider top_k)
            and not (self._scan_auto and (base_c > 256 or self._scan_off))
            and not _force_fp32
        )

        # per-row rescue for certificate-flagged rows: slice the already-
        # device-resident query buffer (no host bounce) and run the fp32
        # single-pass over JUST those rows, asynchronously
        def tp_rescue(rows, _q=q_dev):
            q_sub = jnp.take(_q, jnp.asarray(np.asarray(rows, np.int32)), axis=0)
            return self.topk_async(q_sub, k, exact, _force_fp32=True)

        # adaptive-margin feedback, bound to THIS dispatch's margin so a
        # stale handle resolved after growth doesn't double-grow
        def on_rate(frac, _margin=self._tie_margin):
            self._note_rescue_rate(frac, _margin)

        if self.mesh is not None and use_scan:
            # sharded exact two-pass: the candidate margin applies PER
            # SHARD (each shard scans 1/n of the rows), so the same
            # k+8 / floor-64 rule is strictly more conservative here
            key = ("2pass", self.scan_dtype, k_pad, c)
            fn = self._sharded_topk_cache.get(key)
            if fn is None:
                fn = make_sharded_two_pass_topk(
                    self.mesh, k_pad, c, self.axis, scan=self.scan_dtype
                )
                self._sharded_topk_cache[key] = fn
            if self.scan_dtype == "int8":
                packed = fn(
                    q_dev, self.scan_corpus, self.scan_scales, self.corpus,
                    self.n_valid, self.scan_bound,
                )
            else:
                packed = fn(q_dev, self.scan_corpus, self.corpus, self.n_valid, self.scan_bound)
            return TwoPassHandle(packed, p, k_eff, tp_rescue, on_rate=on_rate)
        elif self.mesh is not None:
            key = (k_pad, exact, self.method, self.int8)
            fn = self._sharded_topk_cache.get(key)
            if fn is None:
                fn = make_sharded_topk(
                    self.mesh, k_pad, self.axis, exact=exact, packed=True,
                    method=self.method, int8=self.int8, tile_n=self.tile_n,
                )
                self._sharded_topk_cache[key] = fn
            if self.int8:
                packed = fn(q_dev, self.corpus, self.scales, self.n_valid)
            else:
                packed = fn(q_dev, self.corpus, self.n_valid)
        elif self.method == "pallas" and self.int8:
            fn = self._packed_topk_cache.get(("pallas_int8", k_pad))
            if fn is None:
                from comorag_tpu.ops.pallas_topk import pallas_mips_topk_int8
                from comorag_tpu.ops.topk import _pack

                @jax.jit
                def fn(q, c, sc, nv, _k=k_pad, _t=self.tile_n):
                    s, i = pallas_mips_topk_int8(q, c, sc.reshape(1, -1), nv, _k, tile_n=_t)
                    return _pack(s, i)

                self._packed_topk_cache[("pallas_int8", k_pad)] = fn
            packed = fn(q_dev, self.corpus, self.scales, self.n_valid)
        elif use_scan:
            # Candidate margin: the dual-int8 residual scan's displacement
            # is ~0 ranks (the certificate bound sits orders below pool
            # gaps); k+8 rounded up, floor 64, keeps certificate headroom
            # and amortizes lax.top_k. The bench verifies overlap = 1.0 on
            # every run. (a pool below k would silently truncate results)
            key = ("2pass", self.scan_dtype, k_pad, c)
            fn = self._packed_topk_cache.get(key)
            if fn is None:
                fn = make_packed_two_pass_topk(k_pad, c, scan=self.scan_dtype)
                self._packed_topk_cache[key] = fn
            if self.scan_dtype == "int8":
                packed = fn(
                    q_dev, self.scan_corpus, self.scan_scales, self.corpus,
                    self.n_valid, self.scan_bound,
                )
            else:
                packed = fn(q_dev, self.scan_corpus, self.corpus, self.n_valid, self.scan_bound)
            return TwoPassHandle(packed, p, k_eff, tp_rescue, on_rate=on_rate)
        elif self.int8:
            fn = self._packed_topk_cache.get(("int8", k_pad, exact))
            if fn is None:
                fn = make_packed_int8_topk(k_pad, exact=exact)
                self._packed_topk_cache[("int8", k_pad, exact)] = fn
            packed = fn(q_dev, self.corpus, self.scales, self.n_valid)
        elif self.method == "pallas":
            fn = self._packed_topk_cache.get(("pallas", k_pad))
            if fn is None:
                from comorag_tpu.ops.pallas_topk import pallas_mips_topk
                from comorag_tpu.ops.topk import _pack

                @jax.jit
                def fn(q, c, nv, _k=k_pad, _t=self.tile_n):
                    s, i = pallas_mips_topk(q, c, nv, _k, tile_n=_t)
                    return _pack(s, i)

                self._packed_topk_cache[("pallas", k_pad)] = fn
            packed = fn(q_dev, self.corpus, self.n_valid)
        else:
            fn = self._packed_topk_cache.get((k_pad, exact))
            if fn is None:
                fn = make_packed_topk(k_pad, exact=exact)
                self._packed_topk_cache[(k_pad, exact)] = fn
            packed = fn(q_dev, self.corpus, self.n_valid)
        return TopkHandle(packed, p, k_eff)

    def _note_rescue_rate(self, frac: float, dispatch_margin: int) -> None:
        """Adaptive-margin feedback from a resolved two-pass batch: a
        rescue-heavy batch means the scan pool boundary sits inside a
        near-tie cluster — widen the pool for FUTURE dispatches so the
        certificate clears without per-row rescues. Exactness is never at
        stake (rescued rows are fp32-exact); this is purely a throughput
        controller for tie-dense corpora (entity synonymy sweeps)."""
        if not self._scan_auto or frac <= _TIE_RATE_GROW:
            return
        if dispatch_margin < self._tie_margin:
            return  # stale handle: growth already happened
        if self._tie_margin >= _TIE_MARGIN_MAX:
            if frac > _TIE_RATE_OFF and not self._scan_off:
                self._scan_off = True
                trace.count("two_pass.margin_exhausted")
                logger.info(
                    "two-pass: %.0f%% of rows still rescue at max pool margin "
                    "%d — falling back to single-pass fp32 for this index",
                    frac * 100, self._tie_margin,
                )
            return
        self._tie_margin = min(max(self._tie_margin * 2, 48), _TIE_MARGIN_MAX)
        trace.count("two_pass.margin_grown")
        logger.debug(
            "two-pass: %.0f%% of rows rescued — pool margin grown to +%d",
            frac * 100, self._tie_margin,
        )

    def topk(self, queries: np.ndarray, k: int, exact: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """Return (scores [P, k], indices [P, k]) as host numpy, descending."""
        return self.topk_async(queries, k, exact).result()

    def topk_many(
        self,
        query_batches: Sequence[np.ndarray],
        k: int,
        exact: bool = True,
        window: int = 64,
        group_rows: int = 256,
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Pipelined fan-out with GROUP COALESCING: consecutive batches are
        concatenated (up to ``group_rows`` query rows) into one dispatch,
        and the packed result is split back per batch on the host.

        Through the remote device tunnel the fan-out cost is dominated by
        per-MESSAGE round-trips (uploads + result fetches pipeline only up
        to the transport's in-flight cap), while the corpus sweep itself is
        shared by every query row in a dispatch — so fewer, larger
        dispatches win on both axes, until groups get so large that
        dispatch/fetch overlap disappears. Interleaved chip A/B at
        100k x 1024, 16-query fan-outs (scripts/exp_group_rows2.py):
        group_rows 1/128/256/512/1024 -> device 18.0/19.4/21.9/17.6/15.5k
        qps, host 5.3/6.9/7.5/6.8/6.3k — 256 peaks both paths.

        Up to ``window`` in-flight packed buffers bound device HBM for
        huge sweeps; dispatch/compute/transfer overlap within the window.
        """
        # materialize first: a lazy iterable could free each array after its
        # handle is queued, letting CPython reuse the id for a DIFFERENT
        # later batch and silently serving it the wrong device buffer
        query_batches = list(query_batches)
        ready: List[TopkHandle] = []
        handles: List[TopkHandle] = []

        def _rows(q) -> int:
            # np.ndim/np.shape (not attribute access) so plain Python lists
            # keep working — _prep_queries coerces them later anyway
            return 1 if np.ndim(q) == 1 else int(np.shape(q)[0])

        def _flush(buf: list) -> None:
            if not buf:
                return
            if len(buf) == 1:
                handles.append(self.topk_async(buf[0], k, exact))
                return
            # device-resident and host batches coalesce separately (a
            # jnp.concatenate is an async device op; np.concatenate is a
            # host memcpy feeding ONE upload instead of len(buf) uploads)
            if isinstance(buf[0], jax.Array):
                qcat = jnp.concatenate([jnp.atleast_2d(q) for q in buf], axis=0)
            else:
                qcat = np.concatenate(
                    [np.atleast_2d(np.asarray(q, np.float32)) for q in buf], axis=0
                )
            shared = _SharedHandle(self.topk_async(qcat, k, exact))
            lo = 0
            for q in buf:
                p = _rows(q)
                handles.append(_SliceHandle(shared, lo, lo + p))
                lo += p

        pend: list = []
        pend_rows = 0
        for q in query_batches:
            p = _rows(q)
            same_kind = not pend or (
                isinstance(q, jax.Array) == isinstance(pend[0], jax.Array)
            )
            if pend and (pend_rows + p > group_rows or not same_kind):
                _flush(pend)
                pend, pend_rows = [], 0
            pend.append(q)
            pend_rows += p
            if pend_rows >= group_rows:
                _flush(pend)
                pend, pend_rows = [], 0
            while len(handles) >= window:
                # prepare() fetches the oldest packed buffer (its copy is
                # already in flight — this is the same bound the old drain
                # had) and LAUNCHES any certificate rescue asynchronously;
                # resolution happens below, after every rescue is airborne
                h = handles.pop(0)
                h.prepare()
                ready.append(h)
        _flush(pend)
        for h in handles:
            h.prepare()
        ready.extend(handles)
        return [h.result() for h in ready]

    def topk_min_async(self, queries, k: int) -> "TopkMinHandle":
        """Top-k + per-row masked min in one packed transfer (fact-linking
        fetch; see make_packed_topk_min / make_sharded_topk_min). Works at
        any device count — under a mesh, per-shard exact scoring merges
        over ICI so the host still receives ONE [P, 2k+1] buffer instead
        of the full [P, F] score matrix."""
        from comorag_tpu.ops.topk import make_packed_topk_min

        q_dev, p = self._prep_queries(queries)
        if self.n == 0:
            # same empty-index guard as topk_async: without it the packed
            # buffer's masked min comes back +inf and downstream min-max
            # normalization produces NaN
            return _EmptyMinHandle(p)
        k_eff = min(k, self.n)
        if self.mesh is not None:
            key = ("topk_min", k_eff, self.int8)
            fn = self._sharded_topk_cache.get(key)
            if fn is None:
                fn = make_sharded_topk_min(self.mesh, k_eff, self.axis, int8=self.int8)
                self._sharded_topk_cache[key] = fn
            if self.int8:
                packed = fn(q_dev, self.corpus, self.scales, self.n_valid)
            else:
                packed = fn(q_dev, self.corpus, self.n_valid)
            return TopkMinHandle(packed, p, k_eff)
        key = ("topk_min", k_eff, self.int8)
        fn = self._packed_topk_cache.get(key)
        if fn is None:
            fn = make_packed_topk_min(k_eff, int8=self.int8)
            self._packed_topk_cache[key] = fn
        if self.int8:
            packed = fn(q_dev, self.corpus, self.scales, self.n_valid)
        else:
            packed = fn(q_dev, self.corpus, self.n_valid)
        return TopkMinHandle(packed, p, k_eff)

    # ----------------------------------------------------------- full scores
    def scores_async(self, queries: np.ndarray, _eager_copy: bool = True) -> "ScoresHandle":
        """Launch full [P, N] scoring and start the host copy; returns a
        handle whose .result() blocks only on its own transfer."""
        # don't force device arrays through numpy — that's a blocking
        # device->host fetch just to re-upload the same values
        if not isinstance(queries, jax.Array):
            queries = np.atleast_2d(np.asarray(queries, np.float32))
        p = 1 if queries.ndim == 1 else queries.shape[0]
        if self.n == 0:
            return ScoresHandle(None, p, 0)
        q_dev, p = self._prep_queries(queries)
        if self.mesh is not None:
            if self.int8:
                s = self._sharded_scores(q_dev, self.corpus, self.scales)
            else:
                s = self._sharded_scores(q_dev, self.corpus)
        elif self.int8:
            s = _int8_scores(q_dev, self.corpus, self.scales)
        else:
            s = dense_scores(q_dev, self.corpus)
        return ScoresHandle(s, p, self.n, eager_copy=_eager_copy)

    def scores(self, queries: np.ndarray) -> np.ndarray:
        """Full raw inner-product scores [P, N] (host numpy)."""
        return self.scores_async(queries).result()

    def scores_stats_async(self, queries, k: int) -> "ScoresStatsHandle":
        """Dense scoring whose HOST transfer is only (top-k, row min, row
        sum) — [P, 2k+2] instead of [P, N] — while the dense buffer stays
        on device for chained consumers (``device_scores()``, the fused
        PPR prior). ``result()`` still lazily downloads the full matrix
        for the host-PPR branch that genuinely needs dense rows."""
        from comorag_tpu.ops.topk import make_packed_stats_from_scores

        if self.n == 0:
            return ScoresStatsHandle(None, None, 1 if np.ndim(queries) == 1 else len(queries), 0, 0)
        handle = self.scores_async(queries, _eager_copy=False)
        dev, p, n = handle.device_scores()
        k_eff = min(k, self.n)
        key = ("scores_stats", k_eff)
        fn = self._packed_topk_cache.get(key)
        if fn is None:
            fn = make_packed_stats_from_scores(k_eff)
            self._packed_topk_cache[key] = fn
        packed = fn(dev, self.n_valid)
        return ScoresStatsHandle(dev, packed, p, n, k_eff)


class ScoresHandle:
    """In-flight full-score query (see TopkHandle)."""

    def __init__(self, dev: Optional[jax.Array], p: int, n: int, eager_copy: bool = True):
        self._dev = dev
        self._p = p
        self._n = n
        if dev is not None and eager_copy:
            _start_host_copy(dev)

    def result(self) -> np.ndarray:
        if self._dev is None:
            return np.zeros((self._p, 0), np.float32)
        return np.asarray(self._dev)[: self._p, : self._n]

    def device_scores(self) -> Tuple[Optional[jax.Array], int, int]:
        """(device buffer [P_pad, N_pad], p, n) WITHOUT forcing the host
        copy — lets downstream device consumers (the fused PPR ranking)
        chain off the scores where they already live."""
        return self._dev, self._p, self._n


class ScoresStatsHandle:
    """In-flight dense scoring with a compact stats transfer (see
    ``MipsIndex.scores_stats_async``). Only the packed stats buffer's
    host copy starts eagerly; the dense matrix downloads on demand."""

    def __init__(self, dev, packed, p: int, n: int, k: int):
        self._dev = dev
        self._packed = packed
        self._p = p
        self._n = n
        self._k = k
        if packed is not None:
            _start_host_copy(packed)

    def stats(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(top-k vals [P, k] desc, idx [P, k] int64, row_min [P],
        row_sum [P]) over the valid columns."""
        if self._packed is None:
            z = np.zeros((self._p, 0), np.float32)
            return z, z.astype(np.int64), np.zeros(self._p, np.float32), np.zeros(self._p, np.float32)
        packed = np.asarray(self._packed)
        k = self._k
        f32 = packed[:, : k + 2].view(np.float32)
        vals = f32[: self._p, :k]
        row_min = f32[: self._p, k]
        row_sum = f32[: self._p, k + 1]
        idx = packed[: self._p, k + 2 : 2 * k + 2].astype(np.int64)
        return vals, idx, row_min, row_sum

    def result(self) -> np.ndarray:
        """Full dense [P, N] (blocking download — host-PPR branch only)."""
        if self._dev is None:
            return np.zeros((self._p, 0), np.float32)
        return np.asarray(self._dev)[: self._p, : self._n]

    def result_rows(self, rows: np.ndarray) -> np.ndarray:
        """Dense scores for a row subset, [len(rows), N] — the host-PPR
        branch needs DPR rows only for probes that linked facts, so slice
        on device and download just those instead of the full [P, N]
        matrix (51 MB at 200k chunks through a remote tunnel)."""
        if self._dev is None:
            return np.zeros((len(rows), 0), np.float32)
        sub = jnp.take(self._dev, jnp.asarray(np.asarray(rows, np.int32)), axis=0)
        return np.asarray(sub[:, : self._n])

    def device_scores(self) -> Tuple[Optional[jax.Array], int, int]:
        return self._dev, self._p, self._n


class _EmptyHandle(TopkHandle):
    def __init__(self, p: int):  # noqa: super-init-not-called
        self._p = p

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        return np.zeros((self._p, 0), np.float32), np.zeros((self._p, 0), np.int64)


class _EmptyMinHandle(TopkMinHandle):
    def __init__(self, p: int):  # noqa: super-init-not-called
        self._p = p

    def result(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return (
            np.zeros((self._p, 0), np.float32),
            np.zeros((self._p, 0), np.int64),
            np.zeros(self._p, np.float32),
        )
