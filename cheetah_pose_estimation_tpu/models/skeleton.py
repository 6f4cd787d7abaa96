"""17-link cheetah skeleton: batched forward kinematics in closed form.

Replaces the reference's SymPy symbolic FK + lambdify pipeline
(``shared.physical_education.links.Link3D`` / ``acinoset_misc.py:1581-1659``)
with direct jitted JAX functions of ``(q, params)``. No codegen, no caching.

Geometry (verified to machine precision against shipped ``fte.pickle``
q -> positions pairs of the reference test set):

* every link is a cylinder aligned along a body-frame axis; orientation is the
  absolute z-y-x Euler rotation ``R = Rz(psi) Ry(theta) Rx(phi)``;
* ``top`` is the attachment end, ``bottom = top + R @ (axis * length)``;
* the base link's centre is ``q[0:3]``; chains:
  bodyF.top = base.bottom, neck.top = bodyF.bottom (all aligned "-x"),
  tail0.top = base.top, tail1.top = tail0.bottom (aligned "+x"),
  legs hang from body side points and are aligned "-z"
  (topology: reference ``cheetah.py:19-200``);
* 24 DLC markers are link end points plus fixed body-frame offsets
  (eye/nose/shoulder/hip offsets: reference ``acinoset_misc.py:1586-1592``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotations import euler_zyx
from .params import LINK_INDEX, LINK_NAMES, N_LINKS, NQ, SubjectParams

MARKERS = (
    "nose", "r_eye", "l_eye", "neck_base", "spine", "tail_base", "tail1",
    "tail2", "r_shoulder", "r_front_knee", "r_front_ankle", "r_front_paw",
    "l_shoulder", "l_front_knee", "l_front_ankle", "l_front_paw", "r_hip",
    "r_back_knee", "r_back_ankle", "r_back_paw", "l_hip", "l_back_knee",
    "l_back_ankle", "l_back_paw",
)
N_MARKERS = len(MARKERS)

# Per-link alignment axis in the body frame (unit vector * sign).
_AXIS = np.zeros((N_LINKS, 3))
_AXIS[0:3, 0] = -1.0   # base, bodyF, neck aligned "-x"
_AXIS[3:5, 0] = +1.0   # tail0, tail1 aligned "+x"
_AXIS[5:, 2] = -1.0    # all leg segments aligned "-z"

_L = LINK_INDEX


class LinkFrames(NamedTuple):
    """World-frame link data for one configuration (leading dims broadcast)."""

    R: jnp.ndarray       # (..., 17, 3, 3) body-to-world rotations
    top: jnp.ndarray     # (..., 17, 3) attachment-end positions
    bottom: jnp.ndarray  # (..., 17, 3) far-end positions
    com: jnp.ndarray     # (..., 17, 3) link centres (cylinder midpoints)


def _angles_from_q(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 54) -> (..., 17, 3) per-link (phi, theta, psi)."""
    base = q[..., 3:6]
    rest = q[..., 6:].reshape(q.shape[:-1] + (N_LINKS - 1, 3))
    return jnp.concatenate([base[..., None, :], rest], axis=-2)


def link_frames(q: jnp.ndarray, params: SubjectParams) -> LinkFrames:
    """Forward kinematics for all 17 links.

    Args:
      q: (..., 54) generalized coordinates.
      params: subject morphology (lengths/radii used; static numpy).

    Returns:
      LinkFrames with world rotations and top/bottom/centre positions.
    """
    angles = _angles_from_q(q)
    R = euler_zyx(angles)  # (..., 17, 3, 3)
    length = jnp.asarray(params.length, dtype=q.dtype)
    radius = jnp.asarray(params.radius, dtype=q.dtype)
    axis = jnp.asarray(_AXIS, dtype=q.dtype)
    # world-frame full-length axis vector per link: R_i @ (axis_i * L_i)
    axis_w = jnp.einsum("...ijk,ik->...ij", R, axis * length[:, None])

    tops = [None] * N_LINKS
    i_base = _L["base"]
    base_com = q[..., 0:3]
    tops[i_base] = base_com - 0.5 * axis_w[..., i_base, :]
    base_bottom = base_com + 0.5 * axis_w[..., i_base, :]
    base_top = tops[i_base]

    tops[_L["bodyF"]] = base_bottom
    bodyF_bottom = base_bottom + axis_w[..., _L["bodyF"], :]
    bodyF_com = base_bottom + 0.5 * axis_w[..., _L["bodyF"], :]
    tops[_L["neck"]] = bodyF_bottom
    tops[_L["tail0"]] = base_top
    tail0_bottom = base_top + axis_w[..., _L["tail0"], :]
    tops[_L["tail1"]] = tail0_bottom

    # Legs: start point on the parent body segment
    # front legs: bodyF.com + R_bodyF @ (-l_F/2, +-r_F, 0)   (cheetah.py:38)
    # back legs:  base.com  + R_base  @ (+l_B/2, +-r_B, 0)
    lF, rF = length[_L["bodyF"]], radius[_L["bodyF"]]
    lB, rB = length[i_base], radius[i_base]
    front_off = lambda sgn_y: jnp.stack(
        [-lF / 2 * jnp.ones(q.shape[:-1], q.dtype),
         sgn_y * rF * jnp.ones(q.shape[:-1], q.dtype),
         jnp.zeros(q.shape[:-1], q.dtype)], axis=-1)
    back_off = lambda sgn_y: jnp.stack(
        [lB / 2 * jnp.ones(q.shape[:-1], q.dtype),
         sgn_y * rB * jnp.ones(q.shape[:-1], q.dtype),
         jnp.zeros(q.shape[:-1], q.dtype)], axis=-1)
    RbF = R[..., _L["bodyF"], :, :]
    Rb = R[..., i_base, :, :]
    tops[_L["UFL"]] = bodyF_com + jnp.einsum("...jk,...k->...j", RbF, front_off(-1.0))
    tops[_L["UFR"]] = bodyF_com + jnp.einsum("...jk,...k->...j", RbF, front_off(+1.0))
    tops[_L["UBL"]] = base_com + jnp.einsum("...jk,...k->...j", Rb, back_off(-1.0))
    tops[_L["UBR"]] = base_com + jnp.einsum("...jk,...k->...j", Rb, back_off(+1.0))
    for thigh, calf, hock in (("UFL", "LFL", "HFL"), ("UFR", "LFR", "HFR"),
                              ("UBL", "LBL", "HBL"), ("UBR", "LBR", "HBR")):
        tops[_L[calf]] = tops[_L[thigh]] + axis_w[..., _L[thigh], :]
        tops[_L[hock]] = tops[_L[calf]] + axis_w[..., _L[calf], :]

    top = jnp.stack(tops, axis=-2)
    bottom = top + axis_w
    com = top + 0.5 * axis_w
    # base link centre is exact q[0:3] (top derived from it)
    com = com.at[..., i_base, :].set(base_com)
    return LinkFrames(R=R, top=top, bottom=bottom, com=com)


# (marker) -> (link, end, body-frame offset); end: 0 = top, 1 = bottom
_MARKER_SPEC = {
    "nose": ("neck", 1, (-0.055, 0.0, -0.055)),
    "r_eye": ("neck", 1, (0.0, 0.045, 0.0)),
    "l_eye": ("neck", 1, (0.0, -0.045, 0.0)),
    "neck_base": ("neck", 0, None),
    "spine": ("base", 1, None),
    "tail_base": ("base", 0, None),
    "tail1": ("tail1", 0, None),
    "tail2": ("tail1", 1, None),
    "r_shoulder": ("bodyF", 1, (0.06, 0.075, -0.15)),
    "r_front_knee": ("UFR", 1, None),
    "r_front_ankle": ("HFR", 0, None),
    "r_front_paw": ("HFR", 1, None),
    "l_shoulder": ("bodyF", 1, (0.06, -0.075, -0.15)),
    "l_front_knee": ("UFL", 1, None),
    "l_front_ankle": ("HFL", 0, None),
    "l_front_paw": ("HFL", 1, None),
    "r_hip": ("base", 0, (-0.06, 0.06, -0.1)),
    "r_back_knee": ("UBR", 1, None),
    "r_back_ankle": ("HBR", 0, None),
    "r_back_paw": ("HBR", 1, None),
    "l_hip": ("base", 0, (-0.06, -0.06, -0.1)),
    "l_back_knee": ("UBL", 1, None),
    "l_back_ankle": ("HBL", 0, None),
    "l_back_paw": ("HBL", 1, None),
}

_MARKER_LINK = np.array([_L[_MARKER_SPEC[m][0]] for m in MARKERS])
_MARKER_END = np.array([_MARKER_SPEC[m][1] for m in MARKERS])
_MARKER_OFFSET = np.array(
    [(_MARKER_SPEC[m][2] or (0.0, 0.0, 0.0)) for m in MARKERS])


def marker_positions(frames: LinkFrames) -> jnp.ndarray:
    """24 DLC marker world positions from link frames. (..., 24, 3)."""
    ends = jnp.stack([frames.top, frames.bottom], axis=-3)  # (..., 2, 17, 3)
    anchors = ends[..., _MARKER_END, _MARKER_LINK, :]       # (..., 24, 3)
    Rm = frames.R[..., _MARKER_LINK, :, :]                  # (..., 24, 3, 3)
    off = jnp.asarray(_MARKER_OFFSET, dtype=anchors.dtype)
    return anchors + jnp.einsum("...mjk,mk->...mj", Rm, off)


def fk_markers(q: jnp.ndarray, params: SubjectParams) -> jnp.ndarray:
    """q (..., 54) -> marker positions (..., 24, 3)."""
    # host callers pass np.float64; canonicalize so q.dtype-based constant
    # creation below does not request an unavailable f64 (warning spam when
    # x64 is off)
    return marker_positions(link_frames(jnp.asarray(q), params))


# ---------------------------------------------------------------------------
# Linear-form FK: markers are linear in the per-link rotation matrices
# ---------------------------------------------------------------------------
#
# Because every link's orientation is an ABSOLUTE Euler rotation (no nesting)
# and every attachment offset is constant in its link's body frame, the chain
# telescopes:      marker_m(q) = q[0:3] + sum_l R_l(q) @ c_{l,m}
# with constant coefficient vectors c. This turns FK into one einsum on the
# MXU and gives closed-form Jacobians: d marker / d angle_lk =
# (dR_l/d angle_k) @ c_{l,m}. The coefficients are extracted once per subject
# by differentiating the chain FK with respect to the rotation matrices.

_COEF_CACHE = {}


def marker_coefficients(params: SubjectParams) -> np.ndarray:
    """(17, 24, 3) constant body-frame coefficient vectors c_{l,m}."""
    key = params.name
    if key in _COEF_CACHE:
        return _COEF_CACHE[key]

    def markers_of_R(R_flat):
        R = R_flat.reshape(N_LINKS, 3, 3)
        q = jnp.zeros(NQ)
        frames = _frames_from_R(q, R, params)
        return marker_positions(frames).reshape(-1)

    # runs eagerly even when first touched inside a traced function
    with jax.ensure_compile_time_eval():
        eye = jnp.broadcast_to(jnp.eye(3), (N_LINKS, 3, 3)).reshape(-1)
        J = np.asarray(jax.jacfwd(markers_of_R)(eye)).reshape(
            N_MARKERS, 3, N_LINKS, 3, 3)
    # linearity in R_l: d marker_i / d R_l[i, j] = c_{l,m}[j] (independent
    # of i); read it off the i = row diagonal
    C = np.einsum("milij->lmj", J) / 3.0
    # verify exactness: rebuild with i=0 row only must agree
    C0 = J[:, 0, :, 0, :].transpose(1, 0, 2)
    assert np.allclose(C, C0, atol=1e-12), "FK is not linear in R?!"
    _COEF_CACHE[key] = C
    return C


def _frames_from_R(q, R, params: SubjectParams) -> LinkFrames:
    """link_frames with externally supplied rotations (coefficient probe)."""
    length = jnp.asarray(params.length, dtype=R.dtype)
    axis = jnp.asarray(_AXIS, dtype=R.dtype)
    axis_w = jnp.einsum("lij,lj->li", R, axis * length[:, None])
    radius = jnp.asarray(params.radius, dtype=R.dtype)
    i_base = _L["base"]
    base_com = q[0:3]
    tops = [None] * N_LINKS
    tops[i_base] = base_com - 0.5 * axis_w[i_base]
    base_bottom = base_com + 0.5 * axis_w[i_base]
    base_top = tops[i_base]
    tops[_L["bodyF"]] = base_bottom
    bodyF_bottom = base_bottom + axis_w[_L["bodyF"]]
    bodyF_com = base_bottom + 0.5 * axis_w[_L["bodyF"]]
    tops[_L["neck"]] = bodyF_bottom
    tops[_L["tail0"]] = base_top
    tops[_L["tail1"]] = base_top + axis_w[_L["tail0"]]
    lF, rF = length[_L["bodyF"]], radius[_L["bodyF"]]
    lB, rB = length[i_base], radius[i_base]
    for name, sgn in (("UFL", -1.0), ("UFR", 1.0)):
        off = jnp.asarray([0.0, 0.0, 0.0]).at[0].set(-lF / 2).at[1].set(
            sgn * rF)
        tops[_L[name]] = bodyF_com + R[_L["bodyF"]] @ off
    for name, sgn in (("UBL", -1.0), ("UBR", 1.0)):
        off = jnp.asarray([0.0, 0.0, 0.0]).at[0].set(lB / 2).at[1].set(
            sgn * rB)
        tops[_L[name]] = base_com + R[i_base] @ off
    for thigh, calf, hock in (("UFL", "LFL", "HFL"), ("UFR", "LFR", "HFR"),
                              ("UBL", "LBL", "HBL"), ("UBR", "LBR", "HBR")):
        tops[_L[calf]] = tops[_L[thigh]] + axis_w[_L[thigh]]
        tops[_L[hock]] = tops[_L[calf]] + axis_w[_L[calf]]
    top = jnp.stack(tops)
    bottom = top + axis_w
    com = top + 0.5 * axis_w
    com = com.at[i_base].set(base_com)
    return LinkFrames(R=R, top=top, bottom=bottom, com=com)


def fk_markers_linear(q: jnp.ndarray, params: SubjectParams) -> jnp.ndarray:
    """Linear-form FK: identical to fk_markers, one rotation stack + einsum."""
    C = jnp.asarray(marker_coefficients(params), q.dtype)
    R = euler_zyx(_angles_from_q(q))                      # (..., 17, 3, 3)
    pts = jnp.einsum("...lij,lmj->...mi", R, C)
    return pts + q[..., None, 0:3]


_COM_COEF_CACHE = {}


def com_coefficients(params: SubjectParams) -> np.ndarray:
    """(17, 17, 3): c^com with com_l(q) = q[0:3] + sum_k R_k(q) c^com[k, l]
    (link centres are linear in the rotations, like the markers)."""
    key = params.name
    if key in _COM_COEF_CACHE:
        return _COM_COEF_CACHE[key]

    def coms_of_R(R_flat):
        R = R_flat.reshape(N_LINKS, 3, 3)
        return _frames_from_R(jnp.zeros(NQ), R, params).com.reshape(-1)

    with jax.ensure_compile_time_eval():
        eye = jnp.broadcast_to(jnp.eye(3), (N_LINKS, 3, 3)).reshape(-1)
        J = np.asarray(jax.jacfwd(coms_of_R)(eye)).reshape(
            N_LINKS, 3, N_LINKS, 3, 3)
    C = np.einsum("likij->klj", J) / 3.0
    _COM_COEF_CACHE[key] = C
    return C


def com_and_jacobian(q: jnp.ndarray, params: SubjectParams):
    """Closed-form (link coms (17, 3), J (17, 3, 54)) for one frame."""
    C = jnp.asarray(com_coefficients(params), q.dtype)  # (k, l, 3)
    ang = _angles_from_q(q)
    R = euler_zyx(ang)                                   # (17, 3, 3)
    coms = jnp.einsum("kij,klj->li", R, C) + q[None, 0:3]
    dR = jax.vmap(jax.jacfwd(euler_zyx))(ang)            # (17, 3, 3, a)
    J_ang = jnp.einsum("kija,klj->lika", dR, C)          # (l, 3, k, a)
    J = jnp.zeros((N_LINKS, 3, NQ), q.dtype)
    J = J.at[:, :, 0:3].set(jnp.broadcast_to(jnp.eye(3, dtype=q.dtype),
                                             (N_LINKS, 3, 3)))
    J = J.at[:, :, 3:6].set(J_ang[:, :, 0])
    J = J.at[:, :, 6:].set(J_ang[:, :, 1:].reshape(N_LINKS, 3, NQ - 6))
    return coms, J


_BOTTOM_COEF_CACHE = {}


def bottom_coefficients(params: SubjectParams) -> np.ndarray:
    """(17, 17, 3): link BOTTOM end points as linear functions of the
    rotations (foot contact points are leg-hock bottoms)."""
    key = params.name
    if key in _BOTTOM_COEF_CACHE:
        return _BOTTOM_COEF_CACHE[key]

    def bottoms_of_R(R_flat):
        R = R_flat.reshape(N_LINKS, 3, 3)
        return _frames_from_R(jnp.zeros(NQ), R, params).bottom.reshape(-1)

    with jax.ensure_compile_time_eval():
        eye = jnp.broadcast_to(jnp.eye(3), (N_LINKS, 3, 3)).reshape(-1)
        J = np.asarray(jax.jacfwd(bottoms_of_R)(eye)).reshape(
            N_LINKS, 3, N_LINKS, 3, 3)
    C = np.einsum("likij->klj", J) / 3.0
    _BOTTOM_COEF_CACHE[key] = C
    return C


def points_and_jacobian_from_coeffs(q: jnp.ndarray, C: jnp.ndarray):
    """Generic linear-in-R point set: positions (L, 3) + Jacobian (L, 3, 54)
    for coefficient tensor C (17, L, 3)."""
    ang = _angles_from_q(q)
    R = euler_zyx(ang)
    pts = jnp.einsum("kij,klj->li", R, C) + q[None, 0:3]
    dR = jax.vmap(jax.jacfwd(euler_zyx))(ang)
    J_ang = jnp.einsum("kija,klj->lika", dR, C)
    L = C.shape[1]
    J = jnp.zeros((L, 3, NQ), q.dtype)
    J = J.at[:, :, 0:3].set(jnp.broadcast_to(jnp.eye(3, dtype=q.dtype),
                                             (L, 3, 3)))
    J = J.at[:, :, 3:6].set(J_ang[:, :, 0])
    J = J.at[:, :, 6:].set(J_ang[:, :, 1:].reshape(L, 3, NQ - 6))
    return pts, J


def fk_markers_and_jacobian(q: jnp.ndarray, params: SubjectParams):
    """Closed-form (markers (24, 3), J (24, 3, 54)) for a single frame.

    J[..., 0:3] = I (base translation); J w.r.t. link l's Euler angles is
    (dR_l/d angle) @ c_{l,m} with dR from a 3-tangent jacfwd of the rotation
    stack (exact; far cheaper than 54 FK tangents).
    """
    C = jnp.asarray(marker_coefficients(params), q.dtype)
    ang = _angles_from_q(q)                               # (17, 3)
    R = euler_zyx(ang)
    pts = jnp.einsum("lij,lmj->mi", R, C) + q[None, 0:3]
    dR = jax.vmap(jax.jacfwd(euler_zyx))(ang)             # (17, 3, 3, 3)
    # J_ang[m, i, l, k] = sum_j dR[l, i, j, k] C[l, m, j]
    J_ang = jnp.einsum("lijk,lmj->milk", dR, C)           # (24, 3, 17, 3)
    J = jnp.zeros((N_MARKERS, 3, NQ), q.dtype)
    J = J.at[:, :, 0:3].set(jnp.broadcast_to(jnp.eye(3, dtype=q.dtype),
                                             (N_MARKERS, 3, 3)))
    J = J.at[:, :, 3:6].set(J_ang[:, :, 0])
    J = J.at[:, :, 6:].set(J_ang[:, :, 1:].reshape(N_MARKERS, 3, NQ - 6))
    return pts, J


def com_position(q: jnp.ndarray, params: SubjectParams) -> jnp.ndarray:
    """Mass-weighted whole-body centre of mass (reference
    ``acinoset_misc.py:722-742``). (..., 3)."""
    q = jnp.asarray(q)
    frames = link_frames(q, params)
    m = jnp.asarray(params.mass, dtype=q.dtype)
    return jnp.einsum("i,...ij->...j", m, frames.com) / params.total_mass


# ---------------------------------------------------------------------------
# Relative ("pose") coordinates x in R^28
# ---------------------------------------------------------------------------

def _build_relative_maps():
    """Constant linear map q (54) -> stacked relative angles (54), plus the
    28-dim mask; mirrors reference ``acinoset_misc.py:487-528,1699-1757``."""
    A = np.zeros((54, 54))
    row = 0

    def ang_ix(link: str) -> int:
        i = _L[link]
        return 3 if i == 0 else 3 * i + 3

    # base: x y z phi theta psi verbatim
    for j in range(6):
        A[row, j] = 1.0
        row += 1
    pairs = [  # (plus, minus) per reference get_relative_angles
        ("bodyF", "base"), ("neck", "bodyF"), ("base", "tail0"),
        ("tail0", "tail1"),
        ("bodyF", "UFL"), ("UFL", "LFL"), ("LFL", "HFL"),
        ("bodyF", "UFR"), ("UFR", "LFR"), ("LFR", "HFR"),
        ("base", "UBL"), ("UBL", "LBL"),
        ("base", "UBR"), ("UBR", "LBR"),
        ("LBL", "HBL"), ("LBR", "HBR"),
    ]
    for plus, minus in pairs:
        for k in range(3):
            A[row, ang_ix(plus) + k] += 1.0
            A[row, ang_ix(minus) + k] -= 1.0
            row += 1
    assert row == 54
    mask = np.zeros(54, dtype=bool)
    mask[0:12] = True                      # base 6 + bodyF 3 + neck 3
    mask[[13, 14, 16, 17]] = True          # tail0/tail1 theta+psi
    for j in range(18, 54, 3):             # all legs: theta only
        mask[j + 1] = True
    assert mask.sum() == 28
    return A, mask


_A_REL_FULL, REL_MASK = _build_relative_maps()
A_REL = _A_REL_FULL[REL_MASK]  # (28, 54)
NX = A_REL.shape[0]


def relative_pose(q: jnp.ndarray) -> jnp.ndarray:
    """q (..., 54) -> reduced relative pose x (..., 28).

    Linear: x = A_REL @ q. Applies equally to dq/ddq (reference applies the
    same extraction to velocities/accelerations, ``acinoset_opt.py:320-329``).
    """
    q = jnp.asarray(q)
    A = jnp.asarray(A_REL, dtype=q.dtype)
    return jnp.einsum("ij,...j->...i", A, q)


# ---------------------------------------------------------------------------
# Joint-structure residuals (reference revolute / Hooke joints)
# ---------------------------------------------------------------------------
# The reference model connects every leg link by a revolute-about-y joint
# (cheetah.py:71-73,101 add_revolute_joint) and the tail links by Hooke-yz
# joints (cheetah.py:160-161 add_hookes_joint). Verified on the shipped
# fte_kinetic solutions: for every leg pair the relative rotation
# R_parent^T R_child IS a pure y-rotation to machine precision, and for the
# tail pairs the (y,z) element of the relative rotation vanishes (Hooke
# composition Ry then Rz). In Euler coordinates these constraints are
# NONLINEAR — naive angle-difference rows are violated by up to pi at the
# true solutions.
REVOLUTE_PAIRS = (
    ("bodyF", "UFL"), ("UFL", "LFL"), ("LFL", "HFL"),
    ("bodyF", "UFR"), ("UFR", "LFR"), ("LFR", "HFR"),
    ("base", "UBL"), ("UBL", "LBL"), ("LBL", "HBL"),
    ("base", "UBR"), ("UBR", "LBR"), ("LBR", "HBR"),
)
HOOKE_PAIRS = (("base", "tail0"), ("tail0", "tail1"))
N_JOINT_RES = 6 * len(REVOLUTE_PAIRS) + len(HOOKE_PAIRS)   # 74


def project_joint_manifold(q: jnp.ndarray) -> jnp.ndarray:
    """Chain-wise geometric projection onto the reference's joint manifold.

    For each leg chain (parent body -> thigh -> calf -> hock) the child's
    absolute rotation is replaced by parent_R @ Ry(theta*) with theta* the
    best-fit pure pitch of the relative rotation (max trace alignment); the
    tail links get the Hooke Ry(a) Rz(b) fit. Free links (base, bodyF,
    neck) keep their raw rotations. Accepts (..., 54); base position and
    free-link angles pass through.

    Use this to move a trajectory solved WITHOUT the joint equalities onto
    the manifold without the distortion of a penalty-driven least-squares
    snap (which trades limb direction against the unobservable roll)."""
    from ..ops.rotations import euler_zyx_inverse, rot_y, rot_z

    ang = _angles_from_q(q)                           # (..., 17, 3)
    R_raw = euler_zyx(ang)                            # (..., 17, 3, 3)
    R_new = {i: R_raw[..., i, :, :] for i in range(N_LINKS)}
    for a, b in REVOLUTE_PAIRS:
        ia, ib = LINK_INDEX[a], LINK_INDEX[b]
        Rp = R_new[ia]
        Rrel = jnp.swapaxes(Rp, -1, -2) @ R_raw[..., ib, :, :]
        th = jnp.arctan2(Rrel[..., 0, 2] - Rrel[..., 2, 0],
                         Rrel[..., 0, 0] + Rrel[..., 2, 2])
        R_new[ib] = Rp @ rot_y(th)
    for a, b in HOOKE_PAIRS:
        ia, ib = LINK_INDEX[a], LINK_INDEX[b]
        Rp = R_new[ia]
        Rrel = jnp.swapaxes(Rp, -1, -2) @ R_raw[..., ib, :, :]
        bb = jnp.arctan2(Rrel[..., 1, 0], Rrel[..., 1, 1])
        aa = jnp.arctan2(Rrel[..., 0, 2], Rrel[..., 2, 2])
        R_new[ib] = Rp @ rot_y(aa) @ rot_z(bb)
    ang_new = jnp.stack([euler_zyx_inverse(R_new[i])
                         for i in range(N_LINKS)], axis=-2)
    out = jnp.asarray(q).at[..., 3:6].set(ang_new[..., 0, :])
    flat = ang_new[..., 1:, :].reshape(*ang_new.shape[:-2], -1)
    out = out.at[..., 6:].set(flat)
    # the Euler extraction wraps to (-pi, pi]; snap each coordinate to the
    # 2pi-branch nearest its input value so trajectories stay continuous
    two_pi = 2.0 * jnp.pi
    q_in = jnp.asarray(q)
    return out + two_pi * jnp.round((q_in - out) / two_pi)


def joint_residuals(q_t: jnp.ndarray) -> jnp.ndarray:
    """(54,) -> (74,) joint-structure residuals, zero on the reference's
    joint manifold.

    Per revolute pair: R_rel e_y - e_y and R_rel^T e_y - e_y (the joint
    axis must be preserved in both frames); per Hooke pair: R_rel[1, 2]
    (zero when the relative rotation composes as Ry(a) Rz(b))."""
    ang = _angles_from_q(q_t)
    R = euler_zyx(ang)                                     # (17, 3, 3)
    ey = jnp.asarray([0.0, 1.0, 0.0], q_t.dtype)
    out = []
    for a, b in REVOLUTE_PAIRS:
        Rrel = R[LINK_INDEX[a]].T @ R[LINK_INDEX[b]]
        out.append(Rrel @ ey - ey)
        out.append(Rrel.T @ ey - ey)
    for a, b in HOOKE_PAIRS:
        Rrel = R[LINK_INDEX[a]].T @ R[LINK_INDEX[b]]
        out.append(Rrel[1, 2][None])
    return jnp.concatenate(out)
