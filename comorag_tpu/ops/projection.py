"""Seeded Gaussian random projection.

Replaces the reference's UMAP reduction (cluster_utils.py:191-211) in the
semantic-tree pipeline. UMAP's NN-graph + SGD is host-hostile and
non-jittable; a Johnson-Lindenstrauss Gaussian projection preserves the
relative distances the downstream GMM consumes, is one MXU matmul, and is
exactly reproducible from a PRNG key (the documented fidelity tradeoff,
SURVEY.md §7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("out_dim",))
def _project(x: jnp.ndarray, key: jax.Array, out_dim: int) -> jnp.ndarray:
    d = x.shape[1]
    w = jax.random.normal(key, (d, out_dim), dtype=jnp.float32) / jnp.sqrt(out_dim)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def random_projection(x: np.ndarray, out_dim: int, seed: int = 224) -> np.ndarray:
    """Project [n, d] -> [n, out_dim]; identity when d <= out_dim."""
    x = np.asarray(x, np.float32)
    if x.shape[1] <= out_dim:
        return x
    key = jax.random.PRNGKey(seed)
    return np.asarray(_project(jnp.asarray(x), key, out_dim))
