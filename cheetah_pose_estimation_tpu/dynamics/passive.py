"""Passive force elements: aerodynamic drag, joint torque springs/dampers.

TPU-native counterparts of the `shared.physical_education` elements the
reference imports at ``cheetah.py:13-15`` (``drag.add_drag``,
``spring.add_torquespring``, ``damper.add_torquedamper``). The shipped
cheetah model never attaches them, but they are part of the modeling surface
(the public physical_education library adds their generalized forces into
the manipulator equation). Here each element is a pure function of
(q, dq) returning a generalized-force vector (54,) that callers add to the
applied-force side of ``dynamics.eom.eom_residual`` or feed to
``dynamics.simulate.simulate`` via ``ext_q_fn``.

Conventions match the rest of the dynamics layer: quadratic drag acts at
link centres, joint springs/dampers act on relative Euler-angle coordinates
expressed as coefficient rows over q (same conjugacy convention as
``eom.TorqueMap``).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import skeleton as sk
from ..models.params import SubjectParams
from . import eom as dyn

NQ = 54


# ---------------------------------------------------------------------------
# aerodynamic drag (reference: physical_education drag.add_drag)
# ---------------------------------------------------------------------------

def cylinder_drag_coefficients(subject: SubjectParams, rho: float = 1.2,
                               cd: float = 0.8) -> np.ndarray:
    """Lumped per-link drag coefficient c = 1/2 rho Cd A with the cylinder
    side area A = length * 2 * radius. Returns (17,)."""
    lengths = np.asarray(subject.length, float)
    radii = np.asarray(subject.radius, float)
    return 0.5 * rho * cd * lengths * 2.0 * radii


def drag_generalized_forces(q: jnp.ndarray, dq: jnp.ndarray,
                            subject: SubjectParams,
                            coeff: jnp.ndarray) -> jnp.ndarray:
    """Quadratic drag F_i = -c_i |v_i| v_i at each link centre -> (54,).

    The generalized force is J^T F with J the link-centre Jacobian,
    evaluated without materializing J (jvp for velocities, vjp for the
    pullback).
    """
    coeff = jnp.asarray(coeff, q.dtype)

    def centres(qq):
        return sk.link_frames(qq, subject).com

    _, vel = jax.jvp(centres, (q,), (dq,))
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    F = -coeff[:, None] * speed * vel
    _, vjp = jax.vjp(centres, q)
    return vjp(F)[0]


# ---------------------------------------------------------------------------
# joint torque springs / dampers
# (reference: physical_education spring.add_torquespring,
#  damper.add_torquedamper)
# ---------------------------------------------------------------------------

def joint_coefficient_row(link_a: str, link_b: str, axis: str) -> np.ndarray:
    """Coefficient row g with g.q = relative angle of link_b w.r.t. link_a
    about ``axis`` — the coordinate a spring/damper between the two links
    acts on (same conjugacy convention as eom.build_torque_map)."""
    off = {"x": 0, "y": 1, "z": 2}[axis]
    g = np.zeros(NQ)
    for name, sgn in ((link_a, -1.0), (link_b, 1.0)):
        i = sk.LINK_INDEX[name]
        g[(3 if i == 0 else 3 * i + 3) + off] = sgn
    return g


class TorqueSpring(NamedTuple):
    """tau = -k (g.q - rest) on each row of G."""
    G: jnp.ndarray          # (R, 54) coordinate rows
    stiffness: jnp.ndarray  # (R,)
    rest: jnp.ndarray       # (R,) rest angles


class TorqueDamper(NamedTuple):
    """tau = -b (g.dq) on each row of G."""
    G: jnp.ndarray          # (R, 54)
    damping: jnp.ndarray    # (R,)


def make_torque_spring(joints: Sequence[Tuple[str, str, str]],
                       stiffness, rest=0.0) -> TorqueSpring:
    G = np.stack([joint_coefficient_row(*j) for j in joints])
    R = len(joints)
    return TorqueSpring(G=jnp.asarray(G),
                        stiffness=jnp.broadcast_to(
                            jnp.asarray(stiffness, float), (R,)),
                        rest=jnp.broadcast_to(
                            jnp.asarray(rest, float), (R,)))


def make_torque_damper(joints: Sequence[Tuple[str, str, str]],
                       damping) -> TorqueDamper:
    G = np.stack([joint_coefficient_row(*j) for j in joints])
    R = len(joints)
    return TorqueDamper(G=jnp.asarray(G),
                        damping=jnp.broadcast_to(
                            jnp.asarray(damping, float), (R,)))


def spring_potential(q: jnp.ndarray, spring: TorqueSpring) -> jnp.ndarray:
    """U = 1/2 sum k (g.q - rest)^2; the generalized force is -dU/dq."""
    r = spring.G.astype(q.dtype) @ q - spring.rest.astype(q.dtype)
    return 0.5 * jnp.sum(spring.stiffness.astype(q.dtype) * r * r)


def spring_generalized_forces(q: jnp.ndarray,
                              spring: TorqueSpring) -> jnp.ndarray:
    r = spring.G.astype(q.dtype) @ q - spring.rest.astype(q.dtype)
    return -(spring.G.astype(q.dtype).T
             @ (spring.stiffness.astype(q.dtype) * r))


def damper_generalized_forces(dq: jnp.ndarray,
                              damper: TorqueDamper) -> jnp.ndarray:
    r = damper.G.astype(dq.dtype) @ dq
    return -(damper.G.astype(dq.dtype).T
             @ (damper.damping.astype(dq.dtype) * r))


def make_ext_q_fn(subject: SubjectParams,
                  drag_coeff=None,
                  spring: TorqueSpring | None = None,
                  damper: TorqueDamper | None = None):
    """Bundle elements into an ``ext_q_fn(q, dq) -> (54,)`` for
    ``dynamics.simulate.simulate``."""

    def ext_q(q, dq):
        Q = jnp.zeros(NQ, q.dtype)
        if drag_coeff is not None:
            Q = Q + drag_generalized_forces(q, dq, subject, drag_coeff)
        if spring is not None:
            Q = Q + spring_generalized_forces(q, spring)
        if damper is not None:
            Q = Q + damper_generalized_forces(dq, damper)
        return Q

    return ext_q
