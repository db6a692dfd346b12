"""Worker process for the multi-host (DCN) corpus-sharding dryrun.

Launched twice by tests/test_multihost_dcn.py: each process owns 4 virtual
CPU devices; jax.distributed stitches them into one 8-device corpus mesh
spanning both processes — the single-host mesh tests' topology, but with
the corpus axis crossing a process (= DCN in production) boundary.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from comorag_tpu.ops.topk import make_sharded_topk
from comorag_tpu.parallel.mesh import build_mesh

assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

mesh = build_mesh({"corpus": 8})
# the mesh must actually span both processes
procs = {d.process_index for d in mesh.devices.ravel()}
assert procs == {0, 1}, procs

N, d, k, nq = 1024, 64, 8, 4
rng = np.random.default_rng(0)  # same seed both processes -> same globals
docs = rng.standard_normal((N, d)).astype(np.float32)
queries = rng.standard_normal((nq, d)).astype(np.float32)

docs_g = jax.make_array_from_callback(
    (N, d), NamedSharding(mesh, P("corpus", None)), lambda idx: docs[idx]
)
queries_g = jax.make_array_from_callback(
    (nq, d), NamedSharding(mesh, P()), lambda idx: queries[idx]
)

fn = make_sharded_topk(mesh, k=k)
scores, idx = fn(queries_g, docs_g, N)
# outputs are replicated; every process reads its local copy
scores = np.asarray(scores.addressable_data(0))
idx = np.asarray(idx.addressable_data(0))

oracle = queries @ docs.T
for q in range(nq):
    want = set(np.argsort(-oracle[q])[:k].tolist())
    got = set(idx[q].tolist())
    assert got == want, (q, got, want)
    np.testing.assert_allclose(
        scores[q], np.sort(oracle[q])[::-1][:k], rtol=1e-5, atol=1e-5
    )

# ---- the r3 serving default (exact two-pass) across the DCN boundary ----
from comorag_tpu.ops.topk import (
    make_sharded_topk_min,
    make_sharded_two_pass_topk,
    quantize_int8_residual,
)

cat_np, s1_np, bound = quantize_int8_residual(docs)
cat_g = jax.make_array_from_callback(
    (N, 2 * d), NamedSharding(mesh, P("corpus", None)), lambda i: cat_np[i]
)
s1_g = jax.make_array_from_callback(
    (N,), NamedSharding(mesh, P("corpus")), lambda i: s1_np[i]
)
fn2 = make_sharded_two_pass_topk(mesh, k=k, candidates=64)
packed = np.asarray(
    fn2(queries_g, cat_g, s1_g, docs_g, N, np.float32(bound)).addressable_data(0)
)
# layout: [P, 2k+1] — k score bits, k idx, 1 exactness flag (scan-tie
# certificate; random Gaussian corpora must never trip it)
tp_scores = packed[:, :k].view(np.float32)
tp_idx = packed[:, k : 2 * k]
assert packed[:, -1].max() == 0, "exactness flag tripped on a separated corpus"
for q in range(nq):
    assert set(tp_idx[q].tolist()) == set(np.argsort(-oracle[q])[:k].tolist())
    np.testing.assert_allclose(tp_scores[q], np.sort(oracle[q])[::-1][:k], rtol=1e-5)

# ---- the fused fact-linking fetch (top-k + row min) across the boundary ----
fnm = make_sharded_topk_min(mesh, k=k)
pk = np.asarray(fnm(queries_g, docs_g, N).addressable_data(0))
row_min = pk[:, k : k + 1].view(np.float32)[:, 0]
np.testing.assert_allclose(row_min, oracle.min(axis=1), rtol=1e-5, atol=1e-5)

# ---- edge-sharded PPR: one psum per iteration over the process boundary ----
from comorag_tpu.ops.ppr import make_sharded_ppr, ppr_dense_reference

n_nodes = 96
ring = np.arange(n_nodes, dtype=np.int32)
g_src = np.concatenate([ring, (ring + 1) % n_nodes])
g_dst = np.concatenate([(ring + 1) % n_nodes, ring])
g_w = np.ones(2 * n_nodes, np.float32)
n_pad = 128
e_pad = ((len(g_src) + 7) // 8) * 8
src_p = np.full(e_pad, n_pad - 1, np.int32)
dst_p = np.full(e_pad, n_pad - 1, np.int32)
rate_p = np.zeros(e_pad, np.float32)
src_p[: len(g_src)] = g_src
dst_p[: len(g_src)] = g_dst
strength = np.zeros(n_pad, np.float64)
np.add.at(strength, g_src, g_w)
rate_p[: len(g_src)] = (g_w / strength[g_src]).astype(np.float32)
order = np.argsort(dst_p, kind="stable")
src_p, dst_p, rate_p = src_p[order], dst_p[order], rate_p[order]
dangling = np.zeros(n_pad, np.float32)

arcs = NamedSharding(mesh, P("corpus"))
rep = NamedSharding(mesh, P())
src_g = jax.make_array_from_callback((e_pad,), arcs, lambda i: src_p[i])
dst_g = jax.make_array_from_callback((e_pad,), arcs, lambda i: dst_p[i])
rate_g = jax.make_array_from_callback((e_pad,), arcs, lambda i: rate_p[i])
dang_g = jax.make_array_from_callback((n_pad,), rep, lambda i: dangling[i])
resets = np.zeros((2, n_pad), np.float32)
resets[0, 0] = 1.0
resets[1, 31] = 1.0
res_g = jax.make_array_from_callback((2, n_pad), rep, lambda i: resets[i])
ppr_fn = make_sharded_ppr(mesh, n_pad, max_iters=200)
out = np.asarray(
    ppr_fn(src_g, dst_g, rate_g, dang_g, res_g,
           np.float32(0.5), np.float32(1e-9)).addressable_data(0)
)
for row, seed_node in ((0, 0), (1, 31)):
    want = ppr_dense_reference(g_src, g_dst, g_w, n_nodes, resets[row, :n_nodes])
    np.testing.assert_allclose(out[row, :n_nodes], want, atol=1e-5)
    assert out[row, :n_nodes].argmax() == seed_node

print(f"DCN_OK {pid}", flush=True)
