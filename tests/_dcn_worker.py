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

print(f"DCN_OK {pid}", flush=True)
