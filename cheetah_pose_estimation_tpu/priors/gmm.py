"""Gaussian-mixture pose prior, trained with a JAX EM loop.

Replaces the reference's sklearn ``GaussianMixture(n_components,
random_state=42, max_iter=20000)`` over the 22 relative joint angles
(``acinoset_models.py:277-300``). Training is jit-compiled full-covariance EM
with seeded k-means++ initialisation; inference exports (means, precisions,
log-normalisers) consumed inside the solver's jitted residual
(``solver.kinematic.GMMPrior``).
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _host_cpu():
    """Offline training runs on the host CPU: the per-step dispatch latency
    of a tunneled accelerator backend dwarfs the arithmetic for these tiny
    (thousands x tens) problems, and the host supports true float64."""
    from ..utils.device import host_cpu

    return host_cpu()


class GMMParams(NamedTuple):
    weights: jnp.ndarray   # (K,)
    means: jnp.ndarray     # (K, D)
    covs: jnp.ndarray      # (K, D, D)

    @property
    def n_components(self) -> int:
        return self.means.shape[0]


def _kmeanspp_init(key, X, k):
    n = X.shape[0]
    key, sub = jax.random.split(key)
    idx0 = jax.random.randint(sub, (), 0, n)
    centers = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(X[idx0])

    def pick(carry, i):
        key, centers = carry
        d2 = jnp.min(
            jnp.sum((X[:, None, :] - centers[None, :, :])**2, axis=-1)
            + jnp.where(jnp.arange(centers.shape[0])[None, :] >= i, 1e30, 0.0),
            axis=1)
        key, sub = jax.random.split(key)
        idx = jax.random.categorical(sub, jnp.log(d2 + 1e-12))
        centers = centers.at[i].set(X[idx])
        return (key, centers), None

    (key, centers), _ = jax.lax.scan(pick, (key, centers),
                                     jnp.arange(1, k))
    return centers


def _log_gaussians(X, means, covs, reg):
    D = X.shape[1]
    covs_r = covs + reg * jnp.eye(D)[None]
    chol = jnp.linalg.cholesky(covs_r)
    dx = X[:, None, :] - means[None, :, :]            # (n, K, D)
    sol = jax.vmap(
        lambda L, v: jax.scipy.linalg.solve_triangular(L, v.T, lower=True),
        in_axes=(0, 1))(chol, dx)                     # (K, D, n)
    quad = jnp.sum(sol**2, axis=1).T                  # (n, K)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)  # (K,)
    return -0.5 * (quad + logdet[None, :] + D * jnp.log(2 * jnp.pi))


def fit(X: np.ndarray, n_components: int, seed: int = 42,
        max_iter: int = 200, tol: float = 1e-4,
        reg_covar: float = 1e-6,
        cache_dir: "str | None" = None) -> GMMParams:
    """Full-covariance EM. Returns mixture parameters.

    With ``cache_dir`` the fitted parameters are stored on disk keyed by
    the md5 of (data bytes, hyper-parameters) — the same caching scheme the
    reference applies to its AR models (acinoset_models.py:191-211)."""
    cache_path = None
    if cache_dir is not None:
        m = hashlib.md5()
        m.update(np.ascontiguousarray(np.asarray(X, np.float64)).tobytes())
        m.update(repr((n_components, seed, max_iter, tol,
                       reg_covar)).encode())
        cache_path = os.path.join(cache_dir,
                                  f"gmm_model_{m.hexdigest()}.tpu")
        if os.path.isfile(cache_path):
            with open(cache_path, "rb") as f:
                w, means, covs = pickle.load(f)
            return GMMParams(jnp.asarray(w), jnp.asarray(means),
                             jnp.asarray(covs))
    with _host_cpu():
        params = _fit(X, n_components, seed, max_iter, tol, reg_covar)
    if cache_path:
        try:
            with open(cache_path, "wb") as f:
                pickle.dump((np.asarray(params.weights),
                             np.asarray(params.means),
                             np.asarray(params.covs)), f)
        except OSError:
            pass  # read-only dataset location (e.g. the reference mount)
    return params


def _fit(X, n_components, seed, max_iter, tol, reg_covar) -> GMMParams:
    X = jnp.asarray(np.asarray(X, dtype=np.float64))
    n, D = X.shape
    k = n_components
    key = jax.random.PRNGKey(seed)
    means0 = _kmeanspp_init(key, X, k)
    covs0 = jnp.broadcast_to(jnp.cov(X.T) + reg_covar * jnp.eye(D),
                             (k, D, D)).astype(X.dtype)
    w0 = jnp.full((k,), 1.0 / k, X.dtype)

    def em_step(carry, _):
        w, means, covs, prev_ll = carry
        logp = _log_gaussians(X, means, covs, reg_covar) + jnp.log(w)[None]
        ll = jnp.mean(jax.scipy.special.logsumexp(logp, axis=1))
        resp = jax.nn.softmax(logp, axis=1)            # (n, K)
        nk = resp.sum(axis=0) + 1e-10
        means_n = (resp.T @ X) / nk[:, None]
        dx = X[:, None, :] - means_n[None, :, :]
        covs_n = jnp.einsum("nk,nki,nkj->kij", resp, dx, dx) / nk[:, None,
                                                                  None]
        covs_n = covs_n + reg_covar * jnp.eye(D)[None]
        return (nk / n, means_n, covs_n, ll), ll

    (w, means, covs, _), lls = jax.lax.scan(
        em_step, (w0, means0, covs0, -jnp.inf), None, length=max_iter)
    return GMMParams(weights=w, means=means, covs=covs)


def score(params: GMMParams, X: np.ndarray,
          reg_covar: float = 1e-6) -> float:
    """Mean per-sample log-likelihood (sklearn ``GaussianMixture.score``)."""
    with _host_cpu():
        X = jnp.asarray(np.asarray(X, dtype=np.float64))
        logp = _log_gaussians(X, params.means, params.covs, reg_covar) \
            + jnp.log(params.weights)[None]
        return float(jnp.mean(jax.scipy.special.logsumexp(logp, axis=1)))


def to_solver_prior(params: GMMParams):
    """Export (means, precisions, log-normalisers) for the in-solver prior.

    log_norm_k = log w_k - 0.5 log det(2 pi Sigma_k), so that the frame cost
    -log(sum_k exp(log_norm_k - 0.5 dx^T P_k dx) + 1e-12) reproduces the
    reference ``gmm_pose_cost`` (acinoset_misc.py:691-707).
    """
    from ..solver.kinematic import GMMPrior

    covs = np.asarray(params.covs)
    prec = np.linalg.inv(covs)
    sign, logdet = np.linalg.slogdet(2 * np.pi * covs)
    log_norm = np.log(np.asarray(params.weights) + 1e-300) - 0.5 * logdet
    # numpy leaves on purpose: an eager jnp.asarray here is the FIRST device
    # op of a cold process and pays the whole tunneled-backend start-up
    # (measured: minutes on the remote-compile path); the batching layer
    # np.stacks these anyway and the jit transfers them at dispatch.
    return GMMPrior(means=np.asarray(params.means), prec=prec,
                    log_norm=log_norm)
