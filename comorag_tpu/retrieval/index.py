"""Host-facing MIPS index over one embedding matrix.

One ``MipsIndex`` per memory layer (veridical chunks, facts, entities,
semantic summaries, episodic timeline). It owns:

  - padding to tile/shard boundaries (XLA static shapes),
  - placement: replicated on one device, or row-sharded over the mesh's
    ``corpus`` axis when a mesh is supplied,
  - query-batch bucketing so the jit cache stays small across the meta
    loop's variable probe fan-out,
  - top-k and full-score entry points returning host numpy.

This is the TPU-native replacement for the reference's per-call
numpy/torch matmuls (ComoRAG.py:937-967, embed_utils.py:8-97).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from comorag_tpu.ops.topk import dense_topk, dense_scores, make_sharded_topk, make_sharded_scores
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_QUERY_BUCKETS = (1, 4, 8, 16, 32, 64, 128, 256)


def _bucket(n: int) -> int:
    for b in _QUERY_BUCKETS:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class MipsIndex:
    def __init__(
        self,
        matrix: np.ndarray,  # [N, d] float32 (host)
        mesh: Optional[Mesh] = None,
        axis: str = "corpus",
        min_rows_per_shard: int = 256,
    ):
        self.n = int(matrix.shape[0])
        self.dim = int(matrix.shape[1]) if matrix.ndim == 2 and matrix.shape[1] else 1
        self.axis = axis

        n_shards = mesh.shape.get(axis, 1) if mesh is not None else 1
        # Sharding tiny layers wastes ICI latency; keep them single-device.
        self.mesh = mesh if (mesh is not None and self.n >= n_shards * min_rows_per_shard) else None
        self.n_shards = mesh.shape[axis] if self.mesh is not None else 1

        pad_to = max(8, self.n_shards * 8)
        self.n_pad = max(_round_up(max(self.n, 1), pad_to), self.n_shards * 8)
        padded = np.zeros((self.n_pad, self.dim), dtype=np.float32)
        if self.n:
            padded[: self.n] = matrix

        if self.mesh is not None:
            sharding = NamedSharding(self.mesh, P(axis, None))
            self.corpus = jax.device_put(padded, sharding)
            self._sharded_topk_cache: Dict[int, object] = {}
            self._sharded_scores = make_sharded_scores(self.mesh, axis)
        else:
            self.corpus = jax.device_put(padded)
        self.n_valid = jnp.asarray(self.n, jnp.int32)

    # ------------------------------------------------------------------ topk
    def topk(self, queries: np.ndarray, k: int, exact: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """Return (scores [P, k], indices [P, k]) as host numpy, descending.
        ``queries`` may be [d] or [P, d]. k is clipped to N."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        p = queries.shape[0]
        if self.n == 0:
            return np.zeros((p, 0), np.float32), np.zeros((p, 0), np.int64)
        k_eff = min(k, self.n)
        # Static-shape padding of both the query batch and k.
        p_pad = _bucket(p)
        k_pad = min(self.n_pad if self.mesh is None else self.n_pad // self.n_shards, _round_up(k_eff, 8))
        k_pad = max(k_pad, k_eff)
        q_pad = np.zeros((p_pad, self.dim), np.float32)
        q_pad[:p] = queries

        if self.mesh is not None:
            fn = self._sharded_topk_cache.get((k_pad, exact))
            if fn is None:
                fn = make_sharded_topk(self.mesh, k_pad, self.axis, exact=exact)
                self._sharded_topk_cache[(k_pad, exact)] = fn
            scores, idx = fn(jnp.asarray(q_pad), self.corpus, self.n_valid)
        else:
            scores, idx = dense_topk(jnp.asarray(q_pad), self.corpus, self.n_valid, k_pad, exact)
        scores = np.asarray(scores)[:p, :k_eff]
        idx = np.asarray(idx)[:p, :k_eff]
        return scores, idx

    # ----------------------------------------------------------- full scores
    def scores(self, queries: np.ndarray) -> np.ndarray:
        """Full raw inner-product scores [P, N] (host numpy)."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        p = queries.shape[0]
        if self.n == 0:
            return np.zeros((p, 0), np.float32)
        p_pad = _bucket(p)
        q_pad = np.zeros((p_pad, self.dim), np.float32)
        q_pad[:p] = queries
        if self.mesh is not None:
            s = self._sharded_scores(jnp.asarray(q_pad), self.corpus)
        else:
            s = dense_scores(jnp.asarray(q_pad), self.corpus)
        return np.asarray(s)[:p, : self.n]
