"""Chip probe: how many iterations does the PPR while_loop actually run,
and what does each cost, at the 200k-corpus graph scale?

Hypothesis (r5): at 400k nodes the fp32 L1 step noise floor sits ABOVE
the 1e-7 device tol, so the loop spins to max_iters instead of stopping
at the ~24 iterations damping 0.5 needs for 1e-7 — a silent 5x tax on
the QA loop's dominant stage.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def make_graph(n_nodes=400_000, n_arcs=2_300_000, seed=3):
    """Hub-heavy symmetric graph shaped like the bench_e2e 200k corpus
    (400k nodes / 4.6M directed arcs after symmetrization)."""
    rng = np.random.default_rng(seed)
    # power-law-ish: half the arcs touch a 1% hub set
    hubs = rng.integers(0, n_nodes // 100, size=n_arcs // 2)
    src = np.concatenate([rng.integers(0, n_nodes, size=n_arcs - n_arcs // 2), hubs]).astype(np.int32)
    dst = rng.integers(0, n_nodes, size=n_arcs).astype(np.int32)
    w = rng.random(n_arcs).astype(np.float32) + 0.1
    # symmetrize
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    return s, d, ww, n_nodes


def main():
    from comorag_tpu.ops.ppr import PPRGraph

    src, dst, w, n = make_graph()
    print(f"graph: {n} nodes, {len(src)} arcs", flush=True)

    rng = np.random.default_rng(0)
    b, s_seeds = 64, 8
    seed_idx = rng.integers(0, n, size=(b, s_seeds)).astype(np.int32)
    seed_w = rng.random((b, s_seeds)).astype(np.float32)
    prior_idx = np.arange(200_000, dtype=np.int32)
    # device-resident prior, as the engine's fused path hands it over
    # (_dpr_prior_rows chains off the resident DPR scores): a host array
    # here would add a ~0.9 s 51 MB tunnel upload to every solve
    prior_w = jnp.asarray((rng.random((b, 200_000)).astype(np.float32)) * 0.005)
    prior_w.block_until_ready()

    for max_iters, tol in ((128, 1e-7), (64, 1e-7), (32, 1e-7), (24, 1e-7), (24, 1e-6), (16, 1e-7)):
        g = PPRGraph(src, dst, w, n, max_iters=max_iters, tol=tol, backend="device")
        sc, pos = g.query_topk(seed_idx, seed_w, prior_idx, prior_w, k=50)  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            sc, pos = g.query_topk(seed_idx, seed_w, prior_idx, prior_w, k=50)
        dt = (time.perf_counter() - t0) / reps
        if max_iters == 128 and tol == 1e-7:
            ref_pos = pos.copy()
        agree = np.mean([
            len(set(pos[i].tolist()) & set(ref_pos[i].tolist())) / 50 for i in range(b)
        ])
        # ranking ORDER agreement on top-20 (what retrieval consumes)
        order = np.mean([
            float(np.array_equal(pos[i][:20], ref_pos[i][:20])) for i in range(b)
        ])
        print(
            f"max_iters={max_iters:3d} tol={tol:.0e}  {dt*1000:7.1f} ms/solve  "
            f"top50 set agree {agree:.4f}  top20 order agree {order:.3f}",
            flush=True,
        )
        del g


if __name__ == "__main__":
    main()
