"""Score normalization and dense similarity helpers.

``min_max_normalize`` matches the reference semantics
(embed_utils.py:99-107): scale to [0,1]; an all-equal vector maps to ones.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def min_max_normalize(scores: jnp.ndarray, valid_mask=None) -> jnp.ndarray:
    """Min-max normalize along the last axis, jit-safe.

    ``valid_mask`` (same shape, bool) restricts the min/max to valid entries
    — needed when corpora are padded to tile boundaries on device.
    """
    if valid_mask is None:
        lo = jnp.min(scores, axis=-1, keepdims=True)
        hi = jnp.max(scores, axis=-1, keepdims=True)
    else:
        big = jnp.asarray(jnp.finfo(scores.dtype).max, scores.dtype)
        lo = jnp.min(jnp.where(valid_mask, scores, big), axis=-1, keepdims=True)
        hi = jnp.max(jnp.where(valid_mask, scores, -big), axis=-1, keepdims=True)
    span = hi - lo
    # span <= 0 covers the all-equal row (== 0, the documented all-ones
    # contract) AND an all-invalid masked row (lo=+max, hi=-max -> span
    # massively negative), which would otherwise skip the contract and
    # emit ~0.5 garbage instead of ones
    degenerate = span <= 0
    normalized = (scores - lo) / jnp.where(degenerate, 1.0, span)
    return jnp.where(degenerate, jnp.ones_like(scores), normalized)


def min_max_normalize_np(scores: np.ndarray) -> np.ndarray:
    """Host-side variant for small vectors (same semantics)."""
    scores = np.asarray(scores)
    if scores.size == 0:
        return scores
    lo, hi = scores.min(), scores.max()
    if hi == lo:
        return np.ones_like(scores)
    return (scores - lo) / (hi - lo)


def min_max_normalize_rows_np(scores: np.ndarray) -> np.ndarray:
    """Row-wise min-max over a [P, N] host matrix, vectorized (no per-row
    Python loop — this sits on the probe fan-out path)."""
    scores = np.asarray(scores, np.float64)
    if scores.size == 0:
        return scores
    lo = scores.min(axis=-1, keepdims=True)
    hi = scores.max(axis=-1, keepdims=True)
    span = hi - lo
    out = (scores - lo) / np.where(span == 0, 1.0, span)
    out[np.broadcast_to(span == 0, out.shape)] = 1.0
    return out


def cosine_similarity_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Host cosine for tiny matrices (memory-pool bookkeeping)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    a_n = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b_n = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return a_n @ b_n.T
