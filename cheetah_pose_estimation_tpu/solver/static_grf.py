"""Per-frame static GRF estimation.

Port of ``CheetahEstimator.estimate_grf`` (reference acinoset_opt.py:176-270):
for each frame of a solved trajectory, with (q, dq, ddq) fixed, find the
contact forces that minimize the squared base-DOF equation-of-motion
residual subject to GRF bounds [0, 5] body weights and the friction
polyhedron mu GRFz >= sum GRFxy (mu = 1.3, acinoset_opt.py:189-192). Feet
outside their stance windows are fixed to zero.

The reference solves one IPOPT NLP per frame (60-minute budget each!); here
it is a projected-gradient quadratic solve, jitted and vmapped over all
frames at once.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics import eom as dyn
from ..models.params import SubjectParams

N_G = dyn.N_FEET + dyn.N_FEET * dyn.N_POLYGON  # 20


def _project_feasible(g: jnp.ndarray, stance: jnp.ndarray, mu: float,
                      gmax: float) -> jnp.ndarray:
    """Project [GRFz(4); GRFxy(16)] onto {0 <= g <= gmax, cone, stance}."""
    gz = jnp.clip(g[:4], 0.0, gmax) * stance
    gxy = jnp.clip(g[4:].reshape(4, 4), 0.0, gmax) * stance[:, None]
    scale = mu * gz / jnp.maximum(gxy.sum(axis=1), 1e-12)
    gxy = gxy * jnp.minimum(scale, 1.0)[:, None]
    return jnp.concatenate([gz, gxy.reshape(16)])


def estimate_static_grf(q: jnp.ndarray, dq: jnp.ndarray, ddq: jnp.ndarray,
                        stance: jnp.ndarray, subject: SubjectParams,
                        mu: float = 1.3, gmax: float = 5.0,
                        iters: int = 150
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-frames static GRF solve.

    Args:
      q, dq, ddq: (N, 54) trajectory state.
      stance: (N, 4) stance indicator per foot.
    Returns:
      (grf_z (N, 4), grf_xy (N, 4, 4)) in body-weight units.
    """
    force_scale = subject.total_mass * dyn.GRAVITY

    def frame(q_t, dq_t, ddq_t, stance_t):
        lhs6 = (dyn.mass_matrix(q_t, subject) @ ddq_t
                + dyn.bias_terms(q_t, dq_t, subject))[:6] / force_scale

        def cols(g):
            gz, gxy = g[:4], g[4:].reshape(4, 4)
            return dyn.grf_generalized_forces(
                q_t, gz, gxy, subject, force_scale)[:6] / force_scale

        A = jax.jacfwd(cols)(jnp.zeros(N_G, q_t.dtype))  # (6, 20)
        AtA = A.T @ A
        Atb = A.T @ lhs6
        # Lipschitz constant for the projected-gradient step
        L = jnp.trace(AtA) + 1e-6

        def body(_, g):
            grad = AtA @ g - Atb
            return _project_feasible(g - grad / L, stance_t, mu, gmax)

        g = jax.lax.fori_loop(0, iters, body,
                              jnp.zeros(N_G, q_t.dtype))
        return g[:4], g[4:].reshape(4, 4)

    return jax.jit(jax.vmap(frame))(q, dq, ddq, stance)
