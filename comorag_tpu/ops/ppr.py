"""Personalized PageRank as jitted sparse power iteration.

Replaces the reference's native igraph/PRPACK call
(ComoRAG.py:1086-1105 — C++ behind ``personalized_pagerank``) with a
device-resident solver:

  x_{t+1} = (1 - alpha) * r + alpha * (P^T x_t + dangling_mass * r)

where ``P`` is the weight-row-normalized transition matrix of the
(undirected -> symmetric COO) graph, ``r`` the normalized reset
distribution, and ``alpha`` the damping factor (0.5 default). The matvec is
one ``segment_sum`` over the edge list — MXU-free but bandwidth-friendly —
and a whole batch of reset vectors (the probe fan-out) solves in one
``vmap``'d program. Converges to PRPACK's fixed point (same linear system);
validated against a numpy dense reference in tests.

Graphs are padded to edge/node buckets so repeated queries share one
compiled program (XLA static shapes).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

_EDGE_BUCKETS = (1024, 4096, 16384, 65536, 262144, 1048576)
_NODE_BUCKETS = (128, 512, 2048, 8192, 32768, 131072)

# Tuning constants live in a per-device-kind profile (VERDICT r2 #6):
#  - state_bytes_budget: above the largest node bucket, nodes round up in
#    FINE steps because the [n_pad, B] fp32 iteration state falls off a
#    VMEM-residency cliff — on the measured v5e (128 MiB VMEM) the
#    per-arc gather runs ~13x slower once the state exceeds ~117-134 MB
#    (524288x64x4B=134MB -> 12.7s/12 iters; 458752x64=112MB -> 0.95s).
#    Batch chunking keeps n_pad * chunk * 4B under the budget.
#  - good_batch: XLA's batched-gather strategy is shape-dependent in the
#    lane dim — measured 400k nodes/5.6M arcs: 1.3s at B=1, 1.6s at B=64
#    but 3.6s at B=4 / 5.6s at B=16; mid widths pad up to this.
#  - crossover_batch_arcs: batch x arcs where the device solve beats the
#    native float64 host solver (12-point sweep, PERF.md).
# Resolution order (env > probe cache > VMEM table > v5e fallback) is in
# ops/device_profile.py; lazy so importing never touches the backend.
_PROFILE = None


def _profile():
    global _PROFILE
    if _PROFILE is None:
        from comorag_tpu.ops.device_profile import resolve_profile

        _PROFILE = resolve_profile()
    return _PROFILE


def _bucket(n: int, buckets, step: int = 0) -> int:
    for b in buckets:
        if n <= b:
            return b
    s = step or buckets[-1]
    return ((n + s - 1) // s) * s


def _max_batch_for_nodes(n_pad: int) -> int:
    """Largest power-of-two reset batch whose [n_pad, B] fp32 state stays
    under the device profile's VMEM-residency budget (floor 1)."""
    cap = max(1, _profile().state_bytes_budget // (n_pad * 4))
    b = 1
    while b * 2 <= cap:
        b *= 2
    return b


def _pad_batch(b: int, n_pad: int) -> int:
    """Device batch width to run at: B=1 keeps the fast single-column
    shape; anything else pads to the profiled good width, capped by the
    VMEM budget."""
    if b <= 1:
        return b
    return max(b, min(_profile().good_batch, _max_batch_for_nodes(n_pad)))


def _to_planar_u16(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 [N, B] -> uint16 [N, 2B] (upper-16-bit columns | lower-16-bit
    columns). A pure BIT layout change — reconstruction is exact."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.concatenate(
        [(u >> 16).astype(jnp.uint16), (u & jnp.uint32(0xFFFF)).astype(jnp.uint16)],
        axis=1,
    )


def _from_planar_u16(v: jnp.ndarray) -> jnp.ndarray:
    """uint16 [*, 2B] -> fp32 [*, B], exact inverse of _to_planar_u16."""
    b = v.shape[-1] // 2
    hi = v[..., :b].astype(jnp.uint32)
    lo = v[..., b:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def _ppr_iterate_nb(src, dst, rate, is_dangling, resets_nb, alpha, tol,
                    n_nodes: int, max_iters: int, axis=None):
    """Batched power iteration over [N, B] state; the single shared body
    for the local and the edge-sharded (psum over ``axis``) solvers.
    Edges must be pre-sorted by dst (PPRGraph.__init__) so segment_sum
    lowers to a segmented reduction instead of random scatter-adds.

    LAYOUT IS THE WHOLE GAME here: the batch rides the minor (lane)
    dimension, so the per-arc gather/scatter index the MAJOR dimension
    and move whole 64/128-float lane tiles per arc. The transposed
    [B, N] formulation (a vmap of per-row solves) makes every arc access
    a single element of the lane-tiled N axis — measured 6x slower on
    the iteration and ~15x slower end-to-end at 400k nodes once the
    [B, N] reset scatters and rank gathers are included (PERF.md).

    The carried state is the fp32 bits in a PLANAR uint16 view (hi-word
    columns | lo-word columns, r5): TPU row gathers of narrow dtypes run
    ~2.2x faster than fp32 at the same byte width (measured, PERF.md PPR
    section), and the bitwise reconstruct fuses into the contrib
    multiply — the per-arc gather is the solve's dominant cost, and this
    keeps results BIT-IDENTICAL to the fp32 formulation (~1.2x on the
    full iteration at 400k nodes / 5.2M arcs).

    Convergence is max-over-batch L1 step size; already-converged
    columns keep iterating (the fixed-point map is a contraction, extra
    steps only tighten them — the vmapped-while formulation froze them
    instead, which is why results can differ from old runs by < tol)."""

    def cond(state):
        _, prev_err, it = state
        return jnp.logical_and(it < max_iters, prev_err > tol)

    def body(state):
        xv, _, it = state
        ge = xv[src, :]  # [E, 2B]: uint16 row gather (the hot op)
        contrib = _from_planar_u16(ge) * rate[:, None]  # exact fp32
        flowed = jax.ops.segment_sum(contrib, dst, num_segments=n_nodes, indices_are_sorted=True)
        if axis is not None:
            flowed = jax.lax.psum(flowed, axis)  # merge shard partials
        xt = _from_planar_u16(xv)
        dangling_mass = jnp.sum(xt * is_dangling[:, None], axis=0)  # [B]
        new_xt = (1.0 - alpha) * resets_nb + alpha * (flowed + dangling_mass[None, :] * resets_nb)
        err = jnp.max(jnp.sum(jnp.abs(new_xt - xt), axis=0))  # worst column's L1 step
        return _to_planar_u16(new_xt), err, it + 1

    xv, _, _ = jax.lax.while_loop(
        cond, body, (_to_planar_u16(resets_nb), jnp.asarray(jnp.inf, jnp.float32), 0)
    )
    return _from_planar_u16(xv)


def _ppr_vmap(src, dst, rate, is_dangling, resets, alpha, tol, n_nodes: int, max_iters: int, axis=None):
    """[B, N]-interface wrapper over the [N, B] iteration core (two cheap
    one-time transposes; the loop itself runs in the fast layout)."""
    xt = _ppr_iterate_nb(
        src, dst, rate, is_dangling, resets.T, alpha, tol, n_nodes, max_iters, axis
    )
    return xt.T


@functools.partial(jax.jit, static_argnames=("n_nodes", "max_iters"))
def _ppr_batch(
    src: jnp.ndarray,        # [E_pad] int32 (padded edges point at node n_nodes-1 w/ weight 0)
    dst: jnp.ndarray,        # [E_pad] int32
    rate: jnp.ndarray,       # [E_pad] f32: w_ij / strength(src) (0 for padding)
    is_dangling: jnp.ndarray,  # [N] f32: 1 where weighted out-degree == 0
    resets: jnp.ndarray,     # [B, N] f32, rows sum to 1 over valid nodes
    alpha: jnp.ndarray,      # scalar damping
    tol: jnp.ndarray,        # scalar L1 tolerance
    n_nodes: int,
    max_iters: int,
) -> jnp.ndarray:
    return _ppr_vmap(src, dst, rate, is_dangling, resets, alpha, tol, n_nodes, max_iters)


@functools.partial(jax.jit, static_argnames=("n_nodes", "max_iters", "k"))
def _ppr_seed_topk(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    rate: jnp.ndarray,
    is_dangling: jnp.ndarray,
    seed_idx: jnp.ndarray,   # [B, S] int32 node ids (padding: weight 0)
    seed_w: jnp.ndarray,     # [B, S] f32 sparse phrase weights
    prior_idx: jnp.ndarray,  # [n_sel] int32 nodes that receive the dense prior AND get ranked
    prior_w: jnp.ndarray,    # [B, n_sel] f32 dense prior (e.g. 0.005 * minmax dpr row)
    alpha: jnp.ndarray,
    tol: jnp.ndarray,
    n_nodes: int,
    max_iters: int,
    k: int,
) -> tuple:
    """Fused query-time graph ranking: build resets ON DEVICE from sparse
    seeds + a device-resident dense prior, solve PPR, rank the prior nodes,
    return their top-k. Uploads O(B*S) instead of a dense [B, N] reset
    matrix; downloads O(B*k) instead of [B, N] ranks — at 100k-corpus
    scale those two transfers dominate the whole fan-out on a
    remote-attached chip."""
    doc = _seed_ppr_doc_ranks(
        src, dst, rate, is_dangling, seed_idx, seed_w, prior_idx, prior_w,
        alpha, tol, n_nodes, max_iters,
    )
    return jax.lax.top_k(doc, k)


def _seed_ppr_doc_ranks(
    src, dst, rate, is_dangling, seed_idx, seed_w, prior_idx, prior_w,
    alpha, tol, n_nodes: int, max_iters: int, axis=None,
) -> jnp.ndarray:
    """Shared core of the fused ranking (local + edge-sharded): build the
    [N, B] resets on device, iterate, gather the prior nodes' ranks.
    Everything large stays in the [N, B] layout — the prior scatter and
    the rank gather index ROWS (whole lane tiles); their [B, N]
    counterparts (`.at[:, prior_idx]` / `ranks[:, prior_idx]`) scatter/
    gather single lane elements and dominated the old 15 s fan-out at
    400k nodes. Returns doc ranks [B, n_sel]."""
    b = seed_w.shape[0]
    cols = jnp.arange(b)[None, :]
    rt = jnp.zeros((n_nodes, b), jnp.float32)
    rt = rt.at[seed_idx.T, cols].add(seed_w.T)  # [S, B]: tiny scatter
    rt = rt.at[prior_idx, :].add(prior_w.T)     # row scatter
    rt = jnp.where(jnp.isnan(rt) | (rt < 0), 0.0, rt)
    sums = rt.sum(axis=0, keepdims=True)
    rt = rt / jnp.where(sums == 0, 1.0, sums)
    ranks_nb = _ppr_iterate_nb(
        src, dst, rate, is_dangling, rt, alpha, tol, n_nodes, max_iters, axis
    )
    return ranks_nb[prior_idx, :].T  # row gather, one [n_sel, B] transpose


def make_sharded_ppr_seed_topk(mesh, n_nodes: int, max_iters: int, k: int, axis: str = "corpus"):
    """Edge-sharded twin of ``_ppr_seed_topk``: arcs shard over ``axis``,
    each device builds the (replicated) resets from the sparse seeds +
    dense prior, iterates with one psum per step, and the replicated
    passage top-k comes back — multi-chip serving keeps the same
    O(B x S) up / O(B x k) down transfer profile as one chip."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def _local(src, dst, rate, is_dangling, seed_idx, seed_w, prior_idx, prior_w, alpha, tol):
        doc = _seed_ppr_doc_ranks(
            src, dst, rate, is_dangling, seed_idx, seed_w, prior_idx, prior_w,
            alpha, tol, n_nodes, max_iters, axis=axis,
        )
        vals, idx = jax.lax.top_k(doc, k)
        return vals, idx  # explicit tuple: top_k yields a list here, which trips out_specs

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_ppr(mesh, n_nodes: int, max_iters: int, axis: str = "corpus"):
    """Edge-sharded batched PPR: the arc list is split across the mesh's
    ``axis``; every device holds the full (replicated) rank vector, does a
    ``segment_sum`` over ITS arcs, and the partial flows merge with one
    ``psum`` per iteration (riding ICI). Scales PPR to graphs whose edge
    list exceeds one device's memory.

    Returned fn: (src [E_pad], dst [E_pad], rate [E_pad], is_dangling [N],
    resets [B, N], alpha, tol) -> [B, N]; E_pad divisible by the axis size.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def _local(src, dst, rate, is_dangling, resets, alpha, tol):
        # each shard's slice of the globally dst-sorted arc list stays sorted
        return _ppr_vmap(src, dst, rate, is_dangling, resets, alpha, tol, n_nodes, max_iters, axis=axis)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


class PPRGraph:
    """Device-resident graph for batched PPR queries.

    Built once from a symmetric weighted edge list; query() takes a batch
    of reset vectors. With a mesh, arcs shard across the ``corpus`` axis
    (see make_sharded_ppr).
    """

    def __init__(
        self,
        src: np.ndarray,
        dst: np.ndarray,
        weights: np.ndarray,
        n_nodes: int,
        max_iters: int = 128,
        tol: float = 1e-10,
        backend: str = "auto",
        mesh=None,
        axis: str = "corpus",
    ):
        """backend: 'device' (JAX), 'native' (C++ host solver), or 'auto' —
        native for small graphs where one host<->device round-trip costs
        more than the whole solve, device at scale. With a mesh, the arc
        list shards over ``axis`` and each iteration psum-merges shard
        partial flows over ICI."""
        self.n_nodes = n_nodes
        self.backend = backend
        self.mesh = mesh if (mesh is not None and axis in getattr(mesh, "shape", {})) else None
        self.axis = axis
        if backend in ("auto", "native"):
            from comorag_tpu import native as _native

            self._native = _native if _native.available() else None
            self._src_host = np.asarray(src, np.int32)
            self._dst_host = np.asarray(dst, np.int32)
            self._w_host = np.asarray(weights, np.float32)
        else:
            self._native = None
        self.n_pad = _bucket(max(n_nodes, 2), _NODE_BUCKETS, _profile().node_bucket_step)
        self.max_iters = max_iters
        self.tol = tol

        e = len(src)
        e_pad = _bucket(max(e, 1), _EDGE_BUCKETS)
        if self.mesh is not None:
            shards = self.mesh.shape[axis]
            e_pad = ((e_pad + shards - 1) // shards) * shards
        src_p = np.full(e_pad, self.n_pad - 1, np.int32)
        dst_p = np.full(e_pad, self.n_pad - 1, np.int32)
        w_p = np.zeros(e_pad, np.float32)
        src_p[:e] = src
        dst_p[:e] = dst
        w_p[:e] = weights

        strength = np.zeros(self.n_pad, np.float64)
        np.add.at(strength, src_p[:e], w_p[:e])
        rate = np.zeros(e_pad, np.float32)
        nz = strength[src_p] > 0
        rate[nz] = (w_p[nz] / strength[src_p[nz]]).astype(np.float32)

        # Sort edges by destination: segment_sum(indices_are_sorted=True)
        # lowers to a segmented reduction instead of random scatter-adds —
        # the hot op of the device solver at 10M+ arcs.
        order = np.argsort(dst_p, kind="stable")
        src_p, dst_p, rate = src_p[order], dst_p[order], rate[order]
        is_dangling = (strength == 0).astype(np.float32)
        # padded nodes never receive reset mass; keep them non-dangling so
        # they don't siphon probability
        is_dangling[n_nodes:] = 0.0

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arc_sharding = NamedSharding(self.mesh, P(axis))
            replicated = NamedSharding(self.mesh, P())
            self._src = jax.device_put(src_p, arc_sharding)
            self._dst = jax.device_put(dst_p, arc_sharding)
            self._rate = jax.device_put(rate, arc_sharding)
            self._dangling = jax.device_put(is_dangling, replicated)
            self._sharded_fn = make_sharded_ppr(self.mesh, self.n_pad, max_iters, axis)
            self._sharded_topk_fns = {}
        else:
            self._src = jnp.asarray(src_p)
            self._dst = jnp.asarray(dst_p)
            self._rate = jnp.asarray(rate)
            self._dangling = jnp.asarray(is_dangling)

    def routes_device(self, b: int) -> bool:
        """Whether a b-reset batch solves on device (vs the native float64
        host solver) under the profiled crossover rule — see query().

        Under a mesh the arc list is SHARDED: each device's per-step work
        is arcs/n_shards (plus one psum), so the crossover compares the
        per-shard arc count (VERDICT r2 weak #6 — the single-chip constant
        over-counted sharded work by n_shards). This is also the mesh
        path's float64 escape hatch: small-batch queries on an ``auto``
        graph still route to the exact host solver."""
        if self._native is None or self.backend == "device":
            return True
        if self.backend == "native":
            return False
        shards = self.mesh.shape[self.axis] if self.mesh is not None else 1
        arcs_per_shard = max(len(self._src_host) // max(shards, 1), 1)
        return b * arcs_per_shard >= _profile().crossover_batch_arcs

    def query_topk(
        self,
        seed_idx: np.ndarray,
        seed_w: np.ndarray,
        prior_idx: np.ndarray,
        prior_w,
        k: int,
        damping: float = 0.5,
    ):
        """Device-fused seeds -> PPR -> top-k over ``prior_idx`` nodes
        (see _ppr_seed_topk). ``prior_w`` may be a device array — the
        intended use hands the min-maxed DPR scores over without a host
        bounce. With a mesh, the edge-sharded twin runs (one psum per
        iteration over ICI) with the same O(B x S) up / O(B x k) down
        transfer profile. Returns (scores [B, k], positions [B, k]) as
        host numpy, positions indexing into prior_idx order."""
        device_tol = max(self.tol, 1e-7)
        k = min(k, int(prior_idx.shape[0]))
        b = int(np.asarray(seed_w).shape[0])
        max_b = _max_batch_for_nodes(self.n_pad)
        if b > max_b:
            # giant graphs: chunk the reset batch so the [n_pad, chunk]
            # state stays VMEM-resident (rows solve independently)
            outs = [
                self.query_topk(
                    np.asarray(seed_idx)[i : i + max_b],
                    np.asarray(seed_w)[i : i + max_b],
                    prior_idx,
                    prior_w[i : i + max_b],
                    k,
                    damping,
                )
                for i in range(0, b, max_b)
            ]
            return (
                np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]),
            )
        target = _pad_batch(b, self.n_pad)
        if target > b:
            # mid-width batches hit XLA's slow gather path — pad with
            # zero-reset columns (they iterate for free) and slice off
            pad = target - b
            s_seeds = np.asarray(seed_idx).shape[1]
            seed_idx = np.concatenate(
                [np.asarray(seed_idx, np.int32), np.zeros((pad, s_seeds), np.int32)]
            )
            seed_w = np.concatenate(
                [np.asarray(seed_w, np.float32), np.zeros((pad, s_seeds), np.float32)]
            )
            prior_pad = jnp.zeros((pad, prior_w.shape[1]), jnp.float32)
            prior_w = jnp.concatenate(
                [jnp.asarray(prior_w, jnp.float32), prior_pad], axis=0
            )
            scores, pos = self.query_topk(seed_idx, seed_w, prior_idx, prior_w, k, damping)
            return scores[:b], pos[:b]
        args = (
            self._src,
            self._dst,
            self._rate,
            self._dangling,
            jnp.asarray(np.asarray(seed_idx, np.int32)),
            jnp.asarray(np.asarray(seed_w, np.float32)),
            jnp.asarray(np.asarray(prior_idx, np.int32)),
            prior_w if isinstance(prior_w, jax.Array) else jnp.asarray(np.asarray(prior_w, np.float32)),
            jnp.asarray(damping, jnp.float32),
            jnp.asarray(device_tol, jnp.float32),
        )
        if self.mesh is not None:
            fn = self._sharded_topk_fns.get(k)
            if fn is None:
                fn = make_sharded_ppr_seed_topk(self.mesh, self.n_pad, self.max_iters, k, self.axis)
                self._sharded_topk_fns[k] = fn
            scores, pos = fn(*args)
        else:
            scores, pos = _ppr_seed_topk(*args, self.n_pad, self.max_iters, k)
        return np.asarray(scores), np.asarray(pos)

    def query(self, resets: np.ndarray, damping: float = 0.5) -> np.ndarray:
        """resets: [B, n_nodes] or [n_nodes] nonnegative; returns PPR scores
        with the same leading shape."""
        resets = np.atleast_2d(np.asarray(resets, np.float32))
        b, n = resets.shape
        assert n == self.n_nodes
        resets = np.where(np.isnan(resets) | (resets < 0), 0.0, resets)
        sums = resets.sum(axis=1, keepdims=True)
        if (sums == 0).any():
            # PRPACK rejects a zero reset vector; scoring one would return
            # all-zero PPR that a top-k caller turns into a FABRICATED
            # ranking (positions 0..k-1). Fail loudly instead.
            raise ValueError(
                f"PPR reset rows {np.nonzero(sums[:, 0] == 0)[0].tolist()} are "
                "all-zero after sanitization (no seeds, no prior) — a zero "
                "reset has no stationary distribution to rank by"
            )
        resets = resets / sums

        # Measured crossover (scripts/bench_ppr_crossover.py on the real
        # chip, PERF.md "PPR host/device crossover"): the device wins once
        # batch x arcs >= ~16M (B=16 @ 1M arcs: 432ms vs 527ms; B=64 @ 10M
        # arcs: 1.8s vs 8.4s = 4.7x), while single resets always favor the
        # host solver (fixed ~30ms tunnel round-trip dominates; B=1 @ 10M
        # arcs: 344ms native vs 1571ms device). All 12 sweep points agree
        # with this rule at top-50 ranking agreement 1.0.
        use_native = not self.routes_device(b)
        if use_native:
            out = self._native.ppr(
                self._src_host,
                self._dst_host,
                self._w_host,
                self.n_nodes,
                resets,
                damping=float(damping),
                tol=self.tol,
                max_iters=self.max_iters,
            )
            if out is not None:
                return out
        max_b = _max_batch_for_nodes(self.n_pad)
        if b > max_b:
            # giant graphs: chunk the reset batch (see query_topk)
            return np.concatenate(
                [self.query(resets[i : i + max_b], damping) for i in range(0, b, max_b)]
            )
        b_run = _pad_batch(b, self.n_pad)  # mid-width gather slow path
        r_pad = np.zeros((b_run, self.n_pad), np.float32)
        r_pad[:b, :n] = resets
        # fp32 L1 error floors near ~1e-7: a tighter tol would spin the
        # while_loop to max_iters without improving the (double-checked)
        # ranking. The native solver keeps the exact tol in float64.
        device_tol = max(self.tol, 1e-7)
        if self.mesh is not None:
            out = self._sharded_fn(
                self._src,
                self._dst,
                self._rate,
                self._dangling,
                jnp.asarray(r_pad),
                jnp.asarray(damping, jnp.float32),
                jnp.asarray(device_tol, jnp.float32),
            )
            return np.asarray(out)[:b, :n]
        out = _ppr_batch(
            self._src,
            self._dst,
            self._rate,
            self._dangling,
            jnp.asarray(r_pad),
            jnp.asarray(damping, jnp.float32),
            jnp.asarray(device_tol, jnp.float32),
            self.n_pad,
            self.max_iters,
        )
        return np.asarray(out)[:b, :n]


def ppr_dense_reference(
    src: np.ndarray,
    dst: np.ndarray,
    weights: np.ndarray,
    n_nodes: int,
    reset: np.ndarray,
    damping: float = 0.5,
    iters: int = 500,
) -> np.ndarray:
    """Slow dense numpy fixed-point solver, for tests only."""
    P = np.zeros((n_nodes, n_nodes), np.float64)
    for s, d, w in zip(src, dst, weights):
        P[s, d] += w
    strength = P.sum(axis=1)
    r = np.asarray(reset, np.float64)
    r = r / r.sum()
    x = r.copy()
    for _ in range(iters):
        flowed = np.zeros(n_nodes)
        nz = strength > 0
        flowed = (x[nz, None] * P[nz] / strength[nz, None]).sum(axis=0)
        dangling = x[~nz].sum()
        x = (1 - damping) * r + damping * (flowed + dangling * r)
    return x
