"""comorag_tpu — a TPU-native memory-organized RAG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ComoRAG
(reference: /root/reference, EternityJune25/ComoRAG): stateful long-narrative
reasoning through a Reason -> Probe -> Retrieve -> Consolidate -> Resolve loop
over a tri-layer memory hierarchy (veridical chunks, semantic cluster tree,
episodic timeline), with graph-augmented retrieval (OpenIE entity graph +
personalized PageRank).

Architecture (TPU-first, not a port):
  - Device world: every dense numeric op — MIPS top-k retrieval, KNN synonymy
    search, PPR sparse matvec, GMM-EM clustering, cosine similarity — runs as
    batched JAX/Pallas kernels, shardable over a ``jax.sharding.Mesh``.
  - Host world: LLM orchestration, prompts, agents, memory-pool bookkeeping,
    persistence. The host/device boundary mirrors where the reference already
    splits (HTTP LLM calls vs. torch/CUDA math).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA/Mosaic compilation cache: Pallas kernel compiles can take
# minutes on remote-compile setups; cache them across processes. Opt out
# with COMORAG_NO_COMPILE_CACHE=1 or by pre-setting JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("COMORAG_NO_COMPILE_CACHE") and not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "jax_comorag"),
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")  # remote compiles: cache aggressively

from comorag_tpu.config import ComoConfig


def __getattr__(name):
    # Lazy import: keep `import comorag_tpu` cheap (jax loads on demand).
    if name == "ComoRAG":
        from comorag_tpu.comorag import ComoRAG

        return ComoRAG
    raise AttributeError(name)


__all__ = ["ComoConfig", "ComoRAG", "__version__"]
