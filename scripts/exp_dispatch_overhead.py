"""Where does the 1.65 ms/batch go on the new worker machine?

Splits the two-pass per-call cost into:
  1. host dispatch overhead: async dispatches/sec of a TINY jitted fn
     (no fetch) — pure Python + axon client cost per call
  2. pure device time per two-pass call: K calls chained in ONE
     executable via lax.scan, one fetch (can't be faked by async dispatch)
  3. the shipped pipelined loop (drain window) for the full two-pass fn —
     what bench.py measures
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.ops import topk as T

N, D, P, K_TOPK, CAND = 100_000, 1024, 16, 50, 64


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    cat, s1, bound = T.quantize_int8_residual(corpus)
    cat_d = jax.device_put(jnp.asarray(cat), dev)
    s1_d = jax.device_put(jnp.asarray(s1), dev)
    c32_d = jax.device_put(jnp.asarray(corpus), dev)
    nv = jax.device_put(jnp.int32(N), dev)
    bd = jax.device_put(jnp.float32(bound), dev)
    qb = rng.standard_normal((64, P, D), dtype=np.float32)
    qb /= np.linalg.norm(qb, axis=2, keepdims=True)
    qs = [jax.device_put(jnp.asarray(qb[i]), dev) for i in range(64)]
    qstack = jax.device_put(jnp.asarray(qb[:32]), dev)
    jax.block_until_ready(qs)

    # 1. dispatch overhead: tiny fn, async dispatch only
    tiny = jax.jit(lambda q: q[0, 0] * 2.0)
    tiny(qs[0])
    time.sleep(0.5)
    t0 = time.perf_counter()
    outs = [tiny(qs[i % 64]) for i in range(512)]
    t1 = time.perf_counter()
    float(outs[-1])
    print(f"tiny async dispatch      {(t1 - t0) / 512 * 1e3:7.3f} ms/call", flush=True)

    fn = T.make_packed_two_pass_topk(K_TOPK, CAND, scan="int8")

    # warm
    jax.block_until_ready(fn(qs[0], cat_d, s1_d, c32_d, nv, bd))

    # 1b. full two-pass async dispatch cost (host side only)
    t0 = time.perf_counter()
    outs = [fn(qs[i % 64], cat_d, s1_d, c32_d, nv, bd) for i in range(256)]
    t1 = time.perf_counter()
    np.asarray(outs[-1])
    print(f"two-pass async dispatch  {(t1 - t0) / 256 * 1e3:7.3f} ms/call", flush=True)

    # 2. pure device time: chain 32 calls in one executable, one fetch
    @jax.jit
    def chained(qst, cc, ss, c32, n_valid, b):
        def step(acc, q):
            out = fn(q, cc, ss, c32, n_valid, b)
            return acc + out.astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(step, jnp.float32(0), qst)
        return tot

    float(chained(qstack, cat_d, s1_d, c32_d, nv, bd))
    rtt_t0 = time.perf_counter()
    noop = jax.jit(lambda q: q.sum())
    float(noop(qs[0]))
    rtt = (time.perf_counter() - rtt_t0) * 1e3
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chained(qstack, cat_d, s1_d, c32_d, nv, bd))
    wall = (time.perf_counter() - t0) / reps * 1e3
    print(f"two-pass device chained  {(wall - rtt) / 32:7.3f} ms/call "
          f"(wall {wall:.1f} ms, rtt {rtt:.1f} ms)", flush=True)

    # 3. shipped pipelined loop with drain window 8 (what serving does)
    window = 8
    t0 = time.perf_counter()
    pend = []
    n_calls = 256
    for i in range(n_calls):
        pend.append(fn(qs[i % 64], cat_d, s1_d, c32_d, nv, bd))
        if len(pend) >= window:
            np.asarray(pend.pop(0))
    for o in pend:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n_calls * 1e3
    print(f"two-pass pipelined(w={window})  {dt:7.3f} ms/call -> "
          f"{P / (dt / 1e3):8.0f} qps", flush=True)


if __name__ == "__main__":
    main()
