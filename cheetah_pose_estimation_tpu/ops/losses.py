"""Robust losses and their generalized-Gauss-Newton weights.

The reference applies a smoothed redescending ("three-part") loss to weighted
reprojection slack variables (``acinoset_misc.py:2001-2015``, used with
a, b, c = 3, 10, 20 at ``acinoset_misc.py:476-482``), letting IPOPT consume its
exact Hessian. Here the same loss enters a generalized Gauss-Newton scheme:
for a cost term rho(e) with e = |w r|, each residual contributes

  gradient weight  g_w = w * psi(e) * sign(r)      (psi = rho')
  curvature weight h_w = w^2 * max(rho''(e), floor)

with rho'' clamped at a small positive floor (Triggs-style correction) so the
normal matrix stays positive definite even in the redescending region.
Derivatives are taken with jax.grad — no hand-derived formulas to drift out of
sync with the loss definition.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _step(start, x):
    return 1.0 / (1.0 + jnp.exp(-(x - start)))


def _piece(start, end, x):
    return _step(start, x) - _step(end, x)


def redescending(e: jnp.ndarray, a: float = 3.0, b: float = 10.0,
                 c: float = 20.0) -> jnp.ndarray:
    """Smoothed three-part redescending loss of |e| (reference formula)."""
    e = jnp.abs(e)
    cost = (1 - _step(a, e)) / 2 * e**2
    cost = cost + _piece(a, b, e) * (a * e - a**2 / 2)
    cost = cost + _piece(b, c, e) * (
        a * b - a**2 / 2 + (a * (c - b) / 2) * (1 - ((c - e) / (c - b))**2))
    cost = cost + _step(c, e) * (a * b - a**2 / 2 + (a * (c - b) / 2))
    return cost


def redescending_smooth(r: jnp.ndarray, c: float) -> jnp.ndarray:
    """Reference ``redescending_smooth_loss`` (acinoset_misc.py:2018-2020)."""
    return 0.25 * c**2 * (jnp.arctan(r / c)**2 + (c * r)**2 / (c**4 + r**4))


def cauchy(r: jnp.ndarray, c: float) -> jnp.ndarray:
    return c**2 * jnp.log1p((r / c)**2)


def fair(r: jnp.ndarray, c: float) -> jnp.ndarray:
    a = jnp.abs(r) / c
    return c**2 * (a - jnp.log1p(a))


def huber(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Quadratic core, linear tail — influence NEVER vanishes. Used by the
    kinetic stage's measurement term: a redescending loss's plateau makes a
    data-ignoring trajectory as cheap as the true one once the EOM term
    dominates, so the solve can run away from the measurements entirely
    (round-2 measured: MPE 0.3-0.9 m with the EOM at its floor); the linear
    tail keeps a restoring gradient at any distance."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 0.5 * r * r, delta * (a - 0.5 * delta))


def quadratic(e: jnp.ndarray) -> jnp.ndarray:
    return e * e  # reference hand-labeled branch: (w*slack)**2


_DERIV_CACHE = {}


def _derivs(loss):
    """(rho', rho'') of a scalar loss rho(e, *params), derived by jax.grad."""
    if loss not in _DERIV_CACHE:
        d1 = jax.grad(lambda x, *p: loss(x, *p))
        d2 = jax.grad(lambda x, *p: d1(x, *p))
        _DERIV_CACHE[loss] = (d1, d2)
    return _DERIV_CACHE[loss]


def gauss_newton_weights(r: jnp.ndarray, w: jnp.ndarray, loss=redescending,
                         curvature_floor: float = 1e-3, loss_params=(),
                         mode: str = "irls", curvature_cap: float = 1.0):
    """Per-residual (gradient, curvature) weights for cost sum rho(w*r).

    Args:
      r: raw residuals (any shape).
      w: per-residual scale weights (broadcastable to r). Entries equal to 0
        fully disable a residual (likelihood gating).
      loss: scalar loss rho(e, *loss_params) applied to the scaled residual.
      curvature_floor: lower clamp on the curvature weight (in e-units) to
        keep H positive definite in the fully-redescended region.
      loss_params: extra (possibly traced) loss parameters, e.g. annealed
        redescending thresholds (a, b, c) for graduated non-convexity.
      mode: "irls" uses the secant curvature psi(e)/e (clamped to
        [floor, cap]) — far better global behavior in the L1-like linear
        region of the redescending loss, where the true rho'' ~ 0 makes
        Newton-weighted LM crawl. "newton" uses clamped rho''.
      curvature_cap: upper clamp for the irls secant weight (handles the
        smoothed loss's nonzero slope at e=0).

    Returns:
      (grad_vec, curv_vec): grad_vec = d cost / d r;
      curv_vec >= 0 approximates d^2 cost / d r^2 for the normal equations.
    """
    d1, d2 = _derivs(loss)
    e = w * r
    flat = e.ravel()
    p = [jnp.broadcast_to(jnp.asarray(v, e.dtype), flat.shape)
         for v in loss_params]
    psi = jax.vmap(d1)(flat, *p).reshape(e.shape)
    g = w * psi
    if mode == "irls":
        secant = jnp.abs(psi) / jnp.maximum(jnp.abs(e), 1e-9)
        hval = jnp.clip(secant, curvature_floor, curvature_cap)
    else:
        hval = jnp.maximum(jax.vmap(d2)(flat, *p).reshape(e.shape),
                           curvature_floor)
    return g, w * w * hval
