"""Seeded Gaussian random projection.

Replaces the reference's UMAP reduction (cluster_utils.py:191-211) in the
semantic-tree pipeline. UMAP's NN-graph + SGD is host-hostile and
non-jittable; a Johnson-Lindenstrauss Gaussian projection preserves the
relative distances the downstream GMM consumes and is exactly
reproducible from a seed (the documented fidelity tradeoff,
SURVEY.md §7.3).

This op deliberately runs on the HOST: the matmul is ~0.5 GFLOP at
100k x 256 (milliseconds in BLAS) while the device route costs a 100 MB
embedding upload through the tunnel (~1.7 s) plus a one-off ~90-245 s
remote compile of the RNG program that the persistent cache was not
retaining — it was the entire semantic-tree stage's cost at scale.
The source embeddings live in host numpy (the store matrix) anyway.
"""

from __future__ import annotations

import numpy as np


def random_projection(x: np.ndarray, out_dim: int, seed: int = 224) -> np.ndarray:
    """Project [n, d] -> [n, out_dim]; identity when d <= out_dim.
    Deterministic in (d, out_dim, seed)."""
    x = np.asarray(x, np.float32)
    if x.shape[1] <= out_dim:
        return x
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((x.shape[1], out_dim)) / np.sqrt(out_dim)).astype(np.float32)
    return x @ w
