"""Measure the PPR host(native C++)/device(JAX) crossover on the real chip.

Round-1 shipped a guessed routing constant (node*arc < 50M -> native);
this sweep replaces it with measured data (VERDICT round 1, item 7).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ppr_crossover.py
"""

import json
import time

import numpy as np

from comorag_tpu.ops.ppr import PPRGraph


def make_graph(n_nodes: int, avg_degree: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    m = n_nodes * avg_degree // 2
    u = rng.integers(0, n_nodes, m)
    v = rng.integers(0, n_nodes, m)
    keep = u != v
    u, v = u[keep], v[keep]
    w = rng.random(len(u)).astype(np.float32) + 0.1
    src = np.concatenate([u, v]).astype(np.int32)
    dst = np.concatenate([v, u]).astype(np.int32)
    ww = np.concatenate([w, w]).astype(np.float32)
    return src, dst, ww


def bench(backend: str, src, dst, w, n_nodes, resets, iters=3):
    g = PPRGraph(src, dst, w, n_nodes, backend=backend, tol=1e-7)
    g.query(resets)  # warmup / compile
    best = float("inf")
    for _ in range(iters):
        t = time.perf_counter()
        out = g.query(resets)
        best = min(best, time.perf_counter() - t)
    return best, out


def main():
    rows = []
    for n_nodes, deg in ((1_000, 10), (10_000, 10), (100_000, 10), (100_000, 100)):
        src, dst, w = make_graph(n_nodes, deg)
        arcs = len(src)
        for n_resets in (1, 16, 64):
            rng = np.random.default_rng(1)
            resets = rng.random((n_resets, n_nodes)).astype(np.float32)
            resets[resets < 0.99] = 0.0  # sparse reset mass like real probes
            t_native, out_n = bench("native", src, dst, w, n_nodes, resets)
            t_device, out_d = bench("device", src, dst, w, n_nodes, resets)
            # ranking agreement on top-50 (what retrieval consumes)
            agree = np.mean([
                len(set(np.argsort(-out_n[i])[:50]) & set(np.argsort(-out_d[i])[:50])) / 50
                for i in range(n_resets)
            ])
            rows.append({
                "nodes": n_nodes, "arcs": arcs, "resets": n_resets,
                "node_arcs": n_nodes * arcs,
                "native_ms": round(t_native * 1e3, 2),
                "device_ms": round(t_device * 1e3, 2),
                "device_speedup": round(t_native / t_device, 2),
                "top50_agreement": round(float(agree), 4),
            })
            print(json.dumps(rows[-1]))
    print("\nTABLE")
    for r in rows:
        print(f"n={r['nodes']:>7} arcs={r['arcs']:>8} B={r['resets']:>3} "
              f"native={r['native_ms']:>9.1f}ms device={r['device_ms']:>9.1f}ms "
              f"speedup={r['device_speedup']:>6.2f}x agree={r['top50_agreement']}")


if __name__ == "__main__":
    main()
