"""Full-covariance Gaussian mixture EM with a vmapped BIC sweep — on device.

Replaces the reference's sklearn GaussianMixture + per-k BIC loop
(cluster_utils.py:175-189, 252-260, 313-323). TPU-first design:

  - ONE jitted program fits ALL candidate k = 1..k_max simultaneously:
    components are padded to ``k_max`` and a per-model active-component
    mask drives both the E-step (inactive components get -inf log-weight)
    and the BIC parameter count. ``vmap`` over the k axis turns the
    reference's 50 sequential sklearn fits into one batched EM.
  - Static shapes: points are padded to a bucket and masked, so repeated
    clustering levels of the RAPTOR tree reuse the compiled program.
  - Numerics: responsibilities via Cholesky solves; covariance
    regularization 1e-6 (sklearn's default reg_covar).

Parity is defined behaviorally (SURVEY.md §7.3): same model family, same
selection criterion (BIC), deterministic under a fixed seed — not
bit-identical memberships.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.utils.jaxcache import ensure_compile_cache
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)

ensure_compile_cache()

_REG = 1e-6
_POINT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


class GMMFit(NamedTuple):
    means: jnp.ndarray       # [k_max, d]
    covs: jnp.ndarray        # [k_max, d, d]
    log_weights: jnp.ndarray # [k_max]
    log_likelihood: jnp.ndarray  # scalar: sum over valid points
    bic: jnp.ndarray         # scalar


def _pad_points(n: int) -> int:
    for b in _POINT_BUCKETS:
        if n <= b:
            return b
    return ((n + 8191) // 8192) * 8192


def _log_gauss(x: jnp.ndarray, means: jnp.ndarray, covs: jnp.ndarray) -> jnp.ndarray:
    """log N(x | mu_k, Sigma_k) for all points/components: [n, k]."""
    d = x.shape[1]
    chol = jnp.linalg.cholesky(covs)  # [k, d, d]
    diff = x[:, None, :] - means[None, :, :]  # [n, k, d]
    # Solve L z = diff  per component.
    solve = jax.vmap(
        lambda L, dk: jax.scipy.linalg.solve_triangular(L, dk.T, lower=True),
        in_axes=(0, 1),
    )(chol, diff)  # [k, d, n]
    maha = jnp.sum(solve**2, axis=1).T  # [n, k]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=1)  # [k]
    return -0.5 * (maha + logdet[None, :] + d * jnp.log(2.0 * jnp.pi))


def _em_single(
    x: jnp.ndarray,          # [n_pad, d]
    point_mask: jnp.ndarray, # [n_pad] bool
    init_means: jnp.ndarray, # [k_max, d]
    comp_mask: jnp.ndarray,  # [k_max] bool — active components for this model
    iters: int,
) -> GMMFit:
    n_pad, d = x.shape
    k_max = init_means.shape[0]
    n_valid = jnp.sum(point_mask)
    k_active = jnp.sum(comp_mask)

    # Shared full covariance as the starting point.
    mean_all = jnp.sum(x * point_mask[:, None], axis=0) / jnp.maximum(n_valid, 1)
    xc = (x - mean_all) * point_mask[:, None]
    # precision=HIGHEST: the TPU default silently truncates fp32 matmul
    # operands to bf16 (CLAUDE.md trap); covariance perturbations ~1e-3
    # swamp the 1e-6 ridge on rank-deficient clusters (dim >= points at
    # upper tree levels) and NaN the Cholesky
    cov_all = jnp.matmul(xc.T, xc, precision=jax.lax.Precision.HIGHEST) / jnp.maximum(
        n_valid, 1
    ) + _REG * jnp.eye(d)

    means0 = jnp.where(comp_mask[:, None], init_means, 0.0)
    covs0 = jnp.broadcast_to(cov_all, (k_max, d, d))
    logw0 = jnp.where(comp_mask, -jnp.log(jnp.maximum(k_active, 1).astype(jnp.float32)), -jnp.inf)

    def step(carry, _):
        means, covs, logw = carry
        log_prob = _log_gauss(x, means, covs) + logw[None, :]          # [n, k]
        log_prob = jnp.where(comp_mask[None, :], log_prob, -jnp.inf)
        log_norm = jax.scipy.special.logsumexp(log_prob, axis=1, keepdims=True)
        resp = jnp.exp(log_prob - log_norm)                             # [n, k]
        resp = resp * point_mask[:, None]

        nk = jnp.sum(resp, axis=0)                                      # [k]
        safe_nk = jnp.maximum(nk, 1e-10)
        new_means = jnp.matmul(
            resp.T, x, precision=jax.lax.Precision.HIGHEST
        ) / safe_nk[:, None]
        diff = x[:, None, :] - new_means[None, :, :]                    # [n, k, d]
        weighted = diff * resp[:, :, None]
        new_covs = jnp.einsum(
            "nkd,nke->kde", weighted, diff,
            precision=jax.lax.Precision.HIGHEST,
        ) / safe_nk[:, None, None]
        new_covs = new_covs + _REG * jnp.eye(d)[None]
        new_logw = jnp.where(comp_mask, jnp.log(safe_nk) - jnp.log(jnp.maximum(n_valid, 1).astype(jnp.float32)), -jnp.inf)

        # Keep inactive components inert (identity cov, zero mean).
        new_means = jnp.where(comp_mask[:, None], new_means, 0.0)
        new_covs = jnp.where(comp_mask[:, None, None], new_covs, jnp.eye(d)[None])
        ll = jnp.sum(jnp.where(point_mask, log_norm[:, 0], 0.0))
        return (new_means, new_covs, new_logw), ll

    (means, covs, logw), lls = jax.lax.scan(step, (means0, covs0, logw0), None, length=iters)
    ll = lls[-1]

    k_f = k_active.astype(jnp.float32)
    n_params = k_f * d + k_f * d * (d + 1) / 2.0 + (k_f - 1.0)
    bic = -2.0 * ll + n_params * jnp.log(jnp.maximum(n_valid, 1).astype(jnp.float32))
    return GMMFit(means, covs, logw, ll, bic)


@functools.partial(jax.jit, static_argnames=("k_max", "iters"))
def _sweep(x, point_mask, init_means, k_max: int, iters: int):
    comp_masks = jnp.arange(1, k_max + 1)[:, None] > jnp.arange(k_max)[None, :]
    fit_k = jax.vmap(lambda cm, im: _em_single(x, point_mask, im, cm, iters), in_axes=(0, 0))
    return fit_k(comp_masks, init_means)


@functools.partial(jax.jit, static_argnames=())
def _posterior(x, point_mask, means, covs, logw):
    log_prob = _log_gauss(x, means, covs) + logw[None, :]
    log_norm = jax.scipy.special.logsumexp(log_prob, axis=1, keepdims=True)
    return jnp.exp(log_prob - log_norm) * point_mask[:, None]


def _init_means_for_sweep(x: np.ndarray, k_max: int, seed: int) -> np.ndarray:
    """Per-model init: model k uses the first k of a shuffled point sample
    (deterministic; analogous role to sklearn's seeded kmeans init)."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    inits = np.zeros((k_max, k_max, x.shape[1]), np.float32)
    for k in range(1, k_max + 1):
        pick = rng.choice(n, size=k, replace=k > n)
        inits[k - 1, :k] = x[pick]
    return inits


def fit_gmm_bic(
    x: np.ndarray,
    max_clusters: int = 50,
    iters: int = 60,
    seed: int = 224,
) -> Tuple[int, np.ndarray]:
    """Sweep k = 1..min(max_clusters, n-1), select by BIC, return
    (best_k, soft memberships [n, best_k]).

    One device program fits every candidate model; selection is an argmin
    on host.
    """
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if n <= 1:
        return 1, np.ones((n, 1), np.float32)
    # Sweep a STATIC k_max so every call with the same point bucket reuses
    # one compiled program (a data-dependent k_max recompiles per cluster
    # size); models with k > n-1 are discarded on host below.
    k_max = max(1, max_clusters)
    k_valid = max(1, min(max_clusters, n - 1))

    n_pad = _pad_points(n)
    x_pad = np.zeros((n_pad, d), np.float32)
    x_pad[:n] = x
    mask = np.zeros((n_pad,), bool)
    mask[:n] = True
    init_means = _init_means_for_sweep(x, k_max, seed)

    fits = _sweep(jnp.asarray(x_pad), jnp.asarray(mask), jnp.asarray(init_means), k_max, iters)
    bics = np.array(fits.bic, copy=True)  # jax buffers are read-only views
    bics[k_valid:] = np.inf  # k > n-1: over-parameterized, not candidates
    bics[~np.isfinite(bics)] = np.inf
    if not np.isfinite(bics).any():
        # every fit diverged (NaN/inf input row, or a numerically
        # indefinite covariance) — argmin would silently pick model 0 and
        # hand NaN responsibilities downstream, where thresholding yields
        # ZERO clusters and the semantic tree quietly degenerates
        logger.warning(
            "GMM BIC sweep: every candidate model diverged (non-finite "
            "BICs) — falling back to one all-points cluster"
        )
        return 1, np.ones((n, 1), np.float32)
    best = int(np.argmin(bics))  # model index -> k = best + 1
    resp = _posterior(
        jnp.asarray(x_pad),
        jnp.asarray(mask),
        fits.means[best],
        fits.covs[best],
        fits.log_weights[best],
    )
    out = np.asarray(resp)[:n, : best + 1]
    if not np.isfinite(out).all():
        logger.warning(
            "GMM posterior is non-finite for the BIC-selected model — "
            "falling back to one all-points cluster"
        )
        return 1, np.ones((n, 1), np.float32)
    return best + 1, out
