"""Per-device tuning constants for the PPR / gather substrate.

Round-2 review (VERDICT r2 weak #4/#6): the PPR solver's VMEM-residency
budget, node-bucket step, good batch width and host/device crossover were
compile-time constants measured on ONE chip (TPU v5e behind the axon
tunnel). On a different TPU generation (different VMEM size, different XLA
gather strategy) they would be silently wrong in either direction. This
module makes them a resolved *profile*:

resolution order (first hit wins, recorded in ``source``):
  1. explicit env overrides (``COMORAG_PPR_STATE_BUDGET_MB``,
     ``COMORAG_PPR_GOOD_BATCH``, ``COMORAG_PPR_CROSSOVER``);
  2. a cached probe result for this device kind
     (``~/.cache/jax_comorag/ppr_profile_<kind>.json`` — written by
     :func:`probe_and_cache`, run once per new chip kind);
  3. the VMEM table for known device kinds — budget = 7/8 of VMEM, the
     same margin that was *measured* on v5e (VMEM 128 MiB, cliff between
     117 and 134 MB, fast through 112 MiB = 7/8);
  4. the measured v5e values as the conservative fallback.

Reference counterpart: PRPACK auto-tunes its solver internally
(ComoRAG.py:1086-1105); our device solver should not be pinned to one
chip either.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# Known per-core VMEM sizes (MiB). v2/v3 cores expose far less vector
# memory than the v4+ generations; unknown kinds fall back to v5e values.
_VMEM_MB_BY_KIND = {
    "tpu v2": 16,
    "tpu v3": 16,
    "tpu v4": 128,
    "tpu v4 lite": 128,
    "tpu v5": 128,
    "tpu v5p": 128,
    "tpu v5 lite": 128,  # the measured chip (v5e)
    "tpu v5e": 128,
    "tpu v6": 128,
    "tpu v6 lite": 128,
    "tpu v6e": 128,
    "tpu7x": 128,
}

# Measured on TPU v5e (scripts/bench_ppr_crossover.py, PERF.md): the
# [n_pad, B] fp32 iteration state falls off a ~13x gather cliff between
# 117 MB and 134 MB; 112 MiB (= 7/8 of the 128 MiB VMEM) stays fast.
_V5E_BUDGET_BYTES = 112 * 2**20
_V5E_GOOD_BATCH = 64
_V5E_CROSSOVER = 16_000_000  # batch x arcs where the device beats native
_NODE_BUCKET_STEP = 32768  # shape-granularity choice, not chip-specific


@dataclasses.dataclass(frozen=True)
class DeviceProfile:
    kind: str
    state_bytes_budget: int
    node_bucket_step: int
    good_batch: int
    crossover_batch_arcs: int
    source: str  # "env" | "probe-cache" | "vmem-table" | "v5e-fallback"


def _cache_path(kind: str) -> str:
    slug = "".join(c if c.isalnum() else "_" for c in kind.lower())
    base = os.path.join(os.path.expanduser("~"), ".cache", "jax_comorag")
    return os.path.join(base, f"ppr_profile_{slug}.json")


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - no backend at all
        return "unknown"


def resolve_profile(kind: Optional[str] = None) -> DeviceProfile:
    kind = (kind or _device_kind()).lower()

    env_budget = os.environ.get("COMORAG_PPR_STATE_BUDGET_MB")
    env_batch = os.environ.get("COMORAG_PPR_GOOD_BATCH")
    env_cross = os.environ.get("COMORAG_PPR_CROSSOVER")
    if env_budget or env_batch or env_cross:
        return DeviceProfile(
            kind=kind,
            state_bytes_budget=int(float(env_budget) * 2**20) if env_budget else _V5E_BUDGET_BYTES,
            node_bucket_step=_NODE_BUCKET_STEP,
            good_batch=int(env_batch) if env_batch else _V5E_GOOD_BATCH,
            crossover_batch_arcs=int(env_cross) if env_cross else _V5E_CROSSOVER,
            source="env",
        )

    path = _cache_path(kind)
    if os.path.exists(path):
        try:
            with open(path) as f:
                d = json.load(f)
            return DeviceProfile(
                kind=kind,
                state_bytes_budget=int(d["state_bytes_budget"]),
                node_bucket_step=int(d.get("node_bucket_step", _NODE_BUCKET_STEP)),
                good_batch=int(d.get("good_batch", _V5E_GOOD_BATCH)),
                crossover_batch_arcs=int(d.get("crossover_batch_arcs", _V5E_CROSSOVER)),
                source="probe-cache",
            )
        except Exception as e:  # pragma: no cover - corrupt cache
            logger.warning("ignoring corrupt ppr profile cache %s: %s", path, e)

    for name, vmem_mb in _VMEM_MB_BY_KIND.items():
        if name in kind:
            return DeviceProfile(
                kind=kind,
                state_bytes_budget=int(vmem_mb * 2**20 * 7 // 8),
                node_bucket_step=_NODE_BUCKET_STEP,
                good_batch=_V5E_GOOD_BATCH,
                crossover_batch_arcs=_V5E_CROSSOVER,
                source="vmem-table",
            )

    return DeviceProfile(
        kind=kind,
        state_bytes_budget=_V5E_BUDGET_BYTES,
        node_bucket_step=_NODE_BUCKET_STEP,
        good_batch=_V5E_GOOD_BATCH,
        crossover_batch_arcs=_V5E_CROSSOVER,
        source="v5e-fallback",
    )


def probe_and_cache(kind: Optional[str] = None, max_mb: int = 256) -> DeviceProfile:
    """Measure THIS device's gather cliff and cache the result.

    One-shot, explicit (costs ~a minute of chip time — never run
    implicitly): times a fixed-iteration PPR solve while growing the
    [n, 64] fp32 state, and sets the budget just under the first size
    whose per-arc time jumps >3x from the small-state baseline.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from comorag_tpu.ops import ppr as _ppr

    kind = (kind or _device_kind()).lower()
    b = _V5E_GOOD_BATCH
    times_per_arc = []
    sizes_mb = []
    n = 2**20  # 4 MB state at B=1; 256 MB at B=64
    budget = _V5E_BUDGET_BYTES
    step_mb = 16
    baseline = None
    # The probe must run UNCHUNKED states: PPRGraph.query splits batches
    # under the ACTIVE profile's budget, so measuring through it can never
    # materialize a state past that budget — the cliff is invisible, the
    # loop exhausts, and max_mb would be cached as the "measured" budget
    # (worse than never probing). Temporarily install an unbounded profile.
    prior = _ppr._PROFILE
    _ppr._PROFILE = DeviceProfile(
        kind=kind, state_bytes_budget=1 << 40, node_bucket_step=_NODE_BUCKET_STEP,
        good_batch=b, crossover_batch_arcs=_V5E_CROSSOVER, source="probe-unbounded",
    )
    try:
        for mb in range(32, max_mb + 1, step_mb):
            n_nodes = mb * 2**20 // (4 * b)
            rng = np.random.default_rng(0)
            e = min(4 * n_nodes, 4_000_000)
            src = rng.integers(0, n_nodes, e).astype(np.int32)
            dst = rng.integers(0, n_nodes, e).astype(np.int32)
            w = np.ones(e, np.float32)
            g = _ppr.PPRGraph(src, dst, w, n_nodes, max_iters=12, tol=0.0, backend="device")
            resets = np.zeros((b, n_nodes), np.float32)
            resets[:, 0] = 1.0
            g.query(resets)  # compile + warm
            t0 = time.perf_counter()
            g.query(resets)
            dt = (time.perf_counter() - t0) / e
            times_per_arc.append(dt)
            sizes_mb.append(mb)
            if baseline is None:
                baseline = dt
            elif dt > 3 * baseline:
                budget = (mb - step_mb) * 2**20
                break
        else:
            budget = max_mb * 2**20
    finally:
        _ppr._PROFILE = prior

    prof = DeviceProfile(
        kind=kind,
        state_bytes_budget=int(budget),
        node_bucket_step=_NODE_BUCKET_STEP,
        good_batch=b,
        crossover_batch_arcs=_V5E_CROSSOVER,
        source="probe-cache",
    )
    path = _cache_path(kind)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "state_bytes_budget": prof.state_bytes_budget,
                "node_bucket_step": prof.node_bucket_step,
                "good_batch": prof.good_batch,
                "crossover_batch_arcs": prof.crossover_batch_arcs,
                "probe_points_mb": sizes_mb,
                "probe_s_per_arc": times_per_arc,
            },
            f,
        )
    logger.info("ppr device profile for %r probed: budget=%d MB -> %s",
                kind, prof.state_bytes_budget // 2**20, path)
    return prof
