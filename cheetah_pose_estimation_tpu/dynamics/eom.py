"""Rigid-body dynamics of the 17-link cheetah by autodiff of link energies.

Replaces the reference's SymPy manipulator-equation pipeline
(``pe.utils.calc_velocities_and_energies`` + ``manipulator_equation`` +
lambdify, driven from ``acinoset_opt.py:120-174``) with closed-form JAX:

  L(q, dq) = KE - PE,  p = dKE/ddq,
  EOM(q, dq, ddq) = M(q) ddq + (dp/dq) dq - dKE/dq + dPE/dq - Q_ext
                  = M ddq + C + G - B            (reference's M, C, G, B)

with M(q) = d^2 KE / ddq^2 — everything jit/vmap-friendly, derived by
``jax.jacfwd``/``jax.grad``; no symbolic stage, no codegen cache.

Each link is a solid cylinder (mass m, radius r, length l) aligned along a
body-frame axis; rotational energy uses the body-frame angular velocity from
the Euler-rate map. Contact forces enter through the friction-polygon
parameterisation of the reference's ``Foot3D``: world force
``F = scale * (GRFz z_hat + sum_i GRFxy_i D_i)`` applied at the foot (hock
bottom) point, with D the 4 polygon directions and scale = total weight
(``acinoset_opt.py:142-160``). Conventions verified numerically against the
reference's shipped ``jules_grf_eom``/``phantom_grf_eom`` lambdified blobs.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import skeleton as sk
from ..models.params import LINK_INDEX, N_LINKS, NQ, SubjectParams
from ..ops.rotations import euler_rate_to_body_omega

GRAVITY = 9.81

FEET_LINKS = ("HFL", "HFR", "HBL", "HBR")
FOOT_NAMES = ("HFL_foot", "HFR_foot", "HBL_foot", "HBR_foot")
N_FEET = 4
N_POLYGON = 4
# friction polygon directions (world frame, unit vectors in the xy plane):
# +x, +y, -x, -y — verified against the shipped grf_eom oracles.
POLYGON_D = np.array([
    [1.0, 0.0, 0.0],
    [0.0, 1.0, 0.0],
    [-1.0, 0.0, 0.0],
    [0.0, -1.0, 0.0],
])


def _inertia_body(subject: SubjectParams) -> np.ndarray:
    """(17, 3) principal moments in each link's body frame.

    Solid cylinder: I_axial = m r^2 / 2, I_perp = m (3 r^2 + l^2) / 12,
    with the cylinder axis along the link's alignment axis
    (x for trunk/tail links, z for leg segments).
    """
    m, r, l = subject.mass, subject.radius, subject.length
    I_ax = 0.5 * m * r**2
    I_perp = m * (3 * r**2 + l**2) / 12.0
    out = np.zeros((N_LINKS, 3))
    axis = np.abs(sk._AXIS).argmax(axis=1)  # 0 for x-aligned, 2 for z-aligned
    for i in range(N_LINKS):
        out[i] = I_perp[i]
        out[i, axis[i]] = I_ax[i]
    return out


def _angles(q: jnp.ndarray) -> jnp.ndarray:
    return sk._angles_from_q(q)


def kinetic_energy(q: jnp.ndarray, dq: jnp.ndarray,
                   subject: SubjectParams) -> jnp.ndarray:
    """Total kinetic energy (translational + rotational)."""
    com_fn = lambda qq: sk.link_frames(qq, subject).com
    _, vcom = jax.jvp(com_fn, (q,), (dq,))            # (17, 3)
    m = jnp.asarray(subject.mass, q.dtype)
    ke_t = 0.5 * jnp.sum(m * jnp.sum(vcom * vcom, axis=-1))
    ang = _angles(q)
    dang = _angles(dq)                                 # Euler-angle rates
    E = euler_rate_to_body_omega(ang)                  # (17, 3, 3)
    omega_b = jnp.einsum("lij,lj->li", E, dang)
    I_b = jnp.asarray(_inertia_body(subject), q.dtype)
    ke_r = 0.5 * jnp.sum(I_b * omega_b * omega_b)
    return ke_t + ke_r


def potential_energy(q: jnp.ndarray, subject: SubjectParams) -> jnp.ndarray:
    com = sk.link_frames(q, subject).com
    m = jnp.asarray(subject.mass, q.dtype)
    return GRAVITY * jnp.sum(m * com[..., 2])


def mass_matrix_ad(q: jnp.ndarray, subject: SubjectParams) -> jnp.ndarray:
    """M(q) = d^2 KE / ddq^2 by nested autodiff (reference cross-check)."""
    ke_dq = jax.grad(kinetic_energy, argnums=1)
    return jax.jacfwd(ke_dq, argnums=1)(q, jnp.zeros_like(q), subject)


def _omega_selector(q: jnp.ndarray) -> jnp.ndarray:
    """(17, 3, 54) map W with omega_body_l = W_l @ dq."""
    ang = sk._angles_from_q(q)
    E = euler_rate_to_body_omega(ang)        # (17, 3, 3)
    W = jnp.zeros((N_LINKS, 3, NQ), q.dtype)
    W = W.at[0, :, 3:6].set(E[0])
    for l in range(1, N_LINKS):
        W = W.at[l, :, 3 * l + 3:3 * l + 6].set(E[l])
    return W


def mass_matrix(q: jnp.ndarray, subject: SubjectParams) -> jnp.ndarray:
    """M(q) in closed form: link CoMs are linear in the rotations, so
    M = sum_l m_l J_l^T J_l + W_l^T I_l W_l with analytic Jacobians
    (matches the nested-autodiff construction to machine precision, ~10x
    cheaper — the kinetic solver evaluates this per frame per iteration)."""
    m = jnp.asarray(subject.mass, q.dtype)
    _, J = sk.com_and_jacobian(q, subject)   # (17, 3, 54)
    W = _omega_selector(q)
    I_b = jnp.asarray(_inertia_body(subject), q.dtype)
    M = jnp.einsum("l,lik,lij->kj", m, J, J) \
        + jnp.einsum("lik,li,lij->kj", W, I_b, W)
    return M


def bias_terms(q: jnp.ndarray, dq: jnp.ndarray,
               subject: SubjectParams) -> jnp.ndarray:
    """C(q, dq) + G(q): velocity products + gravity, (54,).

    C = Mdot dq - 1/2 d(dq^T M dq)/dq with Mdot = jvp of the analytic M
    along dq; G = g sum_l m_l J_l[2, :].
    """
    _, Mdot = jax.jvp(lambda qq: mass_matrix(qq, subject), (q,), (dq,))
    dke_dq = 0.5 * jax.grad(
        lambda qq: dq @ mass_matrix(qq, subject) @ dq)(q)
    m = jnp.asarray(subject.mass, q.dtype)
    _, J = sk.com_and_jacobian(q, subject)
    G = GRAVITY * jnp.einsum("l,lk->k", m, J[:, 2, :])
    return Mdot @ dq - dke_dq + G


def foot_points(q: jnp.ndarray, subject: SubjectParams) -> jnp.ndarray:
    """(4, 3) world positions of the feet (hock bottoms), order FEET_LINKS."""
    bottom = sk.link_frames(q, subject).bottom
    idx = jnp.asarray([LINK_INDEX[n] for n in FEET_LINKS])
    return bottom[..., idx, :]


def grf_generalized_forces(q: jnp.ndarray, grf_z: jnp.ndarray,
                           grf_xy: jnp.ndarray, subject: SubjectParams,
                           force_scale: float) -> jnp.ndarray:
    """B(q): generalized forces of the polygon contact model, (54,).

    Args:
      grf_z: (4,) vertical components in body-weight units.
      grf_xy: (4, 4) polygon components in body-weight units.
      force_scale: total_mass * 9.81 (reference ``scale_forces_by``).
    """
    D = jnp.asarray(POLYGON_D, q.dtype)
    F = (grf_z[:, None] * jnp.asarray([0.0, 0.0, 1.0], q.dtype)
         + jnp.einsum("fi,ij->fj", grf_xy, D)) * force_scale  # (4, 3)

    def virtual_work(qq):
        return jnp.sum(foot_points(qq, subject) * F)

    return jax.grad(virtual_work)(q)


def eom_residual(q: jnp.ndarray, dq: jnp.ndarray, ddq: jnp.ndarray,
                 grf_z: jnp.ndarray, grf_xy: jnp.ndarray,
                 subject: SubjectParams,
                 tau_forces: jnp.ndarray | None = None) -> jnp.ndarray:
    """M ddq + C + G - B - B_tau, (54,). grf in body-weight units."""
    force_scale = subject.total_mass * GRAVITY
    M = mass_matrix(q, subject)
    cg = bias_terms(q, dq, subject)
    B = grf_generalized_forces(q, grf_z, grf_xy, subject, force_scale)
    res = M @ ddq + cg - B
    if tau_forces is not None:
        res = res - tau_forces
    return res


# ---------------------------------------------------------------------------
# joint torque actuation
# ---------------------------------------------------------------------------

class TorqueMap(NamedTuple):
    """Linear map from the 22 motor torque components to generalized forces.

    Motors (reference cheetah.py:81-165): neck<->bodyF about xyz,
    bodyF<->base about xyz, base<->tail0 about yz, tail0<->tail1 about yz,
    and per leg hip/knee/ankle about y. A torque component about axis a
    between links (A, B) is conjugate to the relative Euler angle
    (angle_B - angle_A)[a]: it adds +tau to B's angle-a coordinate and -tau
    to A's.
    """
    B: np.ndarray      # (54, n_tau)
    names: Tuple[str, ...]


def _axis_offset(axis: str) -> int:
    return {"x": 0, "y": 1, "z": 2}[axis]


def build_torque_map() -> TorqueMap:
    # motor names match the reference's tau-dict keys exactly (verified from
    # a shipped fte_kinetic fte.pickle)
    motors = [
        ("neck", "bodyF", "xyz", "neck_bodyF_torque"),
        ("bodyF", "base", "xyz", "bodyF_base_torque"),
        ("base", "tail0", "yz", "base_tail0_torque"),
        ("tail0", "tail1", "yz", "tail0_tail1_torque"),
    ]
    for front, body in (("F", "bodyF"), ("B", "base")):
        for side in ("L", "R"):
            u, l, h = f"U{front}{side}", f"L{front}{side}", f"H{front}{side}"
            fb = "front" if front == "F" else "back"
            rl = "left" if side == "L" else "right"
            motors.append((body, u, "y", f"{fb}-{rl}-hip-pitch"))
            motors.append((u, l, "y", f"{u}_{l}_torque"))
            motors.append((l, h, "y", f"{l}_{h}_torque"))
    cols = []
    names = []
    for a, b, axes, base_name in motors:
        for ax in axes:
            col = np.zeros(NQ)
            ia = sk.LINK_INDEX[a]
            ib = sk.LINK_INDEX[b]
            off = _axis_offset(ax)
            # sign convention: +tau acts on the PARENT link a, reaction on
            # the child b — matching the reference's add_torque Tc sign
            # (validated against its shipped kinetic solutions: with the
            # opposite convention every solved torque came out as ~-Tc —
            # flight-phase RMSE ~1.9x the reference RMS and stance-curve
            # correlation ~-0.85; with this one the curves correlate
            # positively, docs/artifacts/grf_parity.csv). B.tau is
            # invariant under flipping (B, tau) jointly, so the dynamics
            # and every solve are unchanged — only exported tau signs.
            col[(3 if ia == 0 else 3 * ia + 3) + off] += 1.0
            col[(3 if ib == 0 else 3 * ib + 3) + off] -= 1.0
            cols.append(col)
            names.append(f"{base_name}:{ax}")
    return TorqueMap(B=np.stack(cols, axis=1), names=tuple(names))


def tau_as_dict(tau: np.ndarray) -> dict:
    """(N, 22) torque array -> the reference's per-motor tau dict layout
    (motor name -> (N, n_components), acinoset_opt.py:310-317)."""
    tau = np.asarray(tau)
    out = {}
    col = 0
    for name in TORQUE_MAP.names:
        motor = name.rsplit(":", 1)[0]
        if motor not in out:
            out[motor] = []
        out[motor].append(tau[:, col])
        col += 1
    return {k: np.stack(v, axis=1) for k, v in out.items()}


TORQUE_MAP = build_torque_map()
N_TAU = TORQUE_MAP.B.shape[1]


def torque_generalized_forces(tau: jnp.ndarray, force_scale: float,
                              dtype=jnp.float64) -> jnp.ndarray:
    """tau (n_tau,) in body-weight units -> generalized forces (54,)."""
    B = jnp.asarray(TORQUE_MAP.B, dtype)
    return B @ (tau * force_scale)
