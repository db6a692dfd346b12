"""Multi-host (DCN) corpus scale-out dryrun (SURVEY.md §2.2/§5).

Two `jax.distributed`-initialized processes, 4 virtual CPU devices each,
form one 8-device `corpus` mesh whose axis crosses the process boundary —
the topology a multi-host TPU pod uses for corpora too big for one host's
HBM (collectives between processes ride DCN there). The sharded top-k
(all_gather merge, ops/topk.py) must return exact results on it.

The reference has no distributed story at all (its only parallelism is
vLLM pass-through ints, vllm_offline.py:37-45).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_corpus_mesh_topk():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_dcn_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    # the worker pins its own platform/device-count flags
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("DCN dryrun timed out:\n" + "\n".join(outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DCN_OK {pid}" in out, out
