"""Chip A/B: two-stage _exact_topk vs plain lax.top_k at the synonymy
KNN shape ([1000, 200k] scores — an ~800 MB fp32 gather OPERAND, far
over the ~128 MB cliff CLAUDE.md documents) and at the bench shape.

Suspected root cause of the 200k index-wall regression (graph.synonymy
476 s in the r4+two-stage run vs ~47 s first-build before it).
"""
from __future__ import annotations

import time

import numpy as np


def timeit(name, fn, *args, iters=2):
    # fetch to host: block_until_ready through the axon tunnel returns
    # before the remote compute drains, so time the full fetch instead
    t0 = time.perf_counter()
    np.asarray(fn(*args)[0])
    print(f"    {name} warm(+compile) {time.perf_counter()-t0:8.2f} s", flush=True)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"    {name} best {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from comorag_tpu.ops.topk import _exact_topk

    for (p, n, k) in ((16, 100_000, 64), (1000, 200_000, 103)):
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.standard_normal((p, n)).astype(np.float32))
        np.asarray(jnp.sum(s))  # drain the upload
        print(f"[{p},{n}] k={k} bytes={s.nbytes/2**20:.0f}MB", flush=True)
        plain = jax.jit(lambda x: jax.lax.top_k(x, k))
        two = jax.jit(lambda x: _exact_topk(x, k))
        timeit("lax.top_k", plain, s)
        timeit("two-stage", two, s)


if __name__ == "__main__":
    main()
