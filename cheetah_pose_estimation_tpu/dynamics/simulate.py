"""Forward dynamics simulation with penalty ground contact.

Counterpart of the reference's trajectory-generation task family
(``cheetah.py:360-704``: drop_test / high_speed_stop / periodic gallop —
legacy tasks outside the reconstruction path, SURVEY.md §2.1). Instead of a
collocation NLP, behaviors are produced by jitted RK4 rollout of the same
autodiff EOM used by the estimator, with a smooth spring-damper +
regularized-Coulomb contact at the feet — which doubles as an independent
validation of the dynamics (energy bookkeeping, physical landing behavior)
and a generator of physically consistent synthetic trials.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.params import SubjectParams
from . import eom as dyn


class ContactParams(NamedTuple):
    stiffness: float = 20000.0    # N/m per foot
    damping: float = 100.0        # N s/m
    friction_mu: float = 0.8
    vel_smooth: float = 0.05      # m/s regularization of Coulomb friction


class SimState(NamedTuple):
    q: jnp.ndarray    # (54,)
    dq: jnp.ndarray   # (54,)


def contact_forces(q: jnp.ndarray, dq: jnp.ndarray, subject: SubjectParams,
                   cp: ContactParams) -> jnp.ndarray:
    """(4, 3) world contact force on each foot (spring-damper + friction)."""
    pts, vel = jax.jvp(lambda qq: dyn.foot_points(qq, subject), (q,), (dq,))
    pen = jnp.maximum(-pts[:, 2], 0.0)                      # penetration
    fz = cp.stiffness * pen - cp.damping * vel[:, 2] * (pen > 0)
    fz = jnp.maximum(fz, 0.0)
    vxy = vel[:, :2]
    speed = jnp.sqrt(jnp.sum(vxy**2, axis=1) + cp.vel_smooth**2)
    fxy = -cp.friction_mu * fz[:, None] * vxy / speed[:, None]
    return jnp.concatenate([fxy, fz[:, None]], axis=1)


def _accel(q, dq, tau, subject: SubjectParams, cp: ContactParams,
           inertia_floor: float = 5e-2, spin_damping: float = 0.05,
           ext_q_fn=None):
    F = contact_forces(q, dq, subject, cp)

    def work(qq):
        return jnp.sum(dyn.foot_points(qq, subject) * F)

    Q_contact = jax.grad(work)(q)
    if ext_q_fn is not None:
        Q_contact = Q_contact + ext_q_fn(q, dq)
    Q_tau = jnp.asarray(dyn.TORQUE_MAP.B, q.dtype) @ tau
    # thin leg segments have ~1e-6 kg m^2 spin inertia about their own axis,
    # making M numerically singular under actuation; floor it (equivalently:
    # real limbs are not ideal thin cylinders) and lightly damp the spin DOFs
    M = dyn.mass_matrix(q, subject) + inertia_floor * jnp.eye(54, dtype=q.dtype)
    rhs = Q_contact + Q_tau - dyn.bias_terms(q, dq, subject) \
        - spin_damping * dq * jnp.concatenate(
            [jnp.zeros(6, q.dtype), jnp.ones(48, q.dtype)])
    # M is SPD: Cholesky (the axon TPU backend lacks f64 LU)
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), rhs)


def simulate(subject: SubjectParams, q0: np.ndarray, dq0: np.ndarray,
             duration: float, dt: float = 2e-4,
             tau_fn=None, contact: ContactParams = ContactParams(),
             record_every: int = 20,
             ext_q_fn=None) -> Tuple[np.ndarray, np.ndarray]:
    """RK4 rollout. Returns (q (T, 54), dq (T, 54)) sampled every
    ``record_every`` steps. ``tau_fn(t, state) -> (22,)`` optional actuation
    (zero = passive); ``ext_q_fn(q, dq) -> (54,)`` optional extra
    generalized forces (e.g. dynamics.passive drag/spring/damper)."""
    steps = int(round(duration / dt))
    n_rec = steps // record_every

    def tau_of(t, s):
        if tau_fn is None:
            return jnp.zeros(dyn.N_TAU, s.q.dtype)
        return tau_fn(t, s)

    def deriv(t, s: SimState):
        return SimState(q=s.dq, dq=_accel(s.q, s.dq, tau_of(t, s), subject,
                                          contact, ext_q_fn=ext_q_fn))

    @jax.jit
    def chunk(state, t0):
        def rk4_step(carry, i):
            s, t = carry
            k1 = deriv(t, s)
            k2 = deriv(t + dt / 2, SimState(s.q + dt / 2 * k1.q,
                                            s.dq + dt / 2 * k1.dq))
            k3 = deriv(t + dt / 2, SimState(s.q + dt / 2 * k2.q,
                                            s.dq + dt / 2 * k2.dq))
            k4 = deriv(t + dt, SimState(s.q + dt * k3.q, s.dq + dt * k3.dq))
            qn = s.q + dt / 6 * (k1.q + 2 * k2.q + 2 * k3.q + k4.q)
            dqn = s.dq + dt / 6 * (k1.dq + 2 * k2.dq + 2 * k3.dq + k4.dq)
            return (SimState(qn, dqn), t + dt), None

        (state, t), _ = jax.lax.scan(rk4_step, (state, t0), None,
                                     length=record_every)
        return state, t

    s = SimState(jnp.asarray(q0), jnp.asarray(dq0))
    t = jnp.asarray(0.0, s.q.dtype)
    qs, dqs = [np.asarray(s.q)], [np.asarray(s.dq)]
    for _ in range(n_rec):
        s, t = chunk(s, t)
        qs.append(np.asarray(s.q))
        dqs.append(np.asarray(s.dq))
    return np.stack(qs), np.stack(dqs)


def drop_pose(subject: SubjectParams, z_rot: float = 0.0,
              height: float = 1.0) -> np.ndarray:
    """Neutral standing pose at a drop height (reference drop_test initial
    state, cheetah.py:653-686)."""
    q = np.zeros(54)
    q[2] = height
    q[5] = np.pi + z_rot
    for i in range(1, 17):
        q[3 * i + 5] = np.pi + z_rot
    return q


def drop_test(subject: SubjectParams, z_rot: float = 0.0,
              initial_height: float = 1.0, duration: float = 0.8,
              hold_pose_gain: float = 300.0, hold_damping: float = 5.0
              ) -> dict:
    """Drop the passive-with-pose-hold cheetah from ``initial_height`` and
    report the landing (reference drop_test semantics: start at rest, fall,
    end not fallen over — cheetah.py:653-704)."""
    q0 = drop_pose(subject, z_rot, initial_height)
    B = jnp.asarray(dyn.TORQUE_MAP.B)

    def tau_fn(t, s):
        # PD pose-hold in motor space: B^T q gives each motor's relative
        # joint angle (the torque map columns are +-1 on the two links)
        err = B.T @ (jnp.asarray(q0, s.q.dtype) - s.q)
        return hold_pose_gain * err - hold_damping * (B.T @ s.dq)

    q, dq = simulate(subject, q0, np.zeros(54), duration, tau_fn=tau_fn)
    final_z = float(q[-1, 2])
    heights, _ = jax.jvp(lambda qq: dyn.foot_points(qq, subject),
                         (jnp.asarray(q[-1]),), (jnp.asarray(dq[-1]),))
    return {
        "q": q, "dq": dq, "final_base_height": final_z,
        "upright": final_z > 0.2,   # reference's end constraint z >= 0.2
        "final_foot_heights": np.asarray(heights[:, 2]),
    }
