"""Trajectory-generation (optimal control) tasks.

TPU-native counterparts of the reference's legacy task family
(``cheetah.py:360-704``): measurement-free trajectory optimization over the
same 17-link dynamics used by the physics-based FTE —

* ``high_speed_stop`` (``cheetah.py:360-486``): start at speed, end at rest,
  feet on the ground after an initial settling window, minimize joint torque
  (optionally also the stopping distance);
* ``periodic_gallop`` (``cheetah.py:489-650``): periodic gait at a prescribed
  average velocity with a prescribed foot-contact order.

Where the reference hands a Pyomo NLP with LCP contact complementarity to
IPOPT, these tasks reuse the kinetic FTE machinery (``solver/kinetic.py``):
the trajectory state is q in R^(N x 54), joint torques and stance GRFs are
eliminated per frame in closed form, and the EOM enters as a weighted slack
residual whose generalized-GN curvature keeps the normal system block-banded
in time. Task-specific boundary/periodicity/box conditions are quadratic
anchors and hinge penalties:

* state/velocity anchors are exact quadratics (diag + first-off-band blocks);
* box bounds use active-set hinge curvature like the FTE joint limits;
* the periodicity residual q[0] - q[N-1] couples the first and last frame —
  outside the band — so its curvature keeps only the two diagonal blocks
  (a PSD over-estimate; the gradient is exact and LM damping absorbs the
  truncation, the standard trick used throughout the kinetic solver).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import params as params_mod
from ..models.params import SubjectParams
from ..ops import banded
from ..solver import gn as gn_mod
from ..solver import kinematic as kin
from ..solver import kinetic as kn
from . import eom as dyn

NQ = kn.NQ


class TaskSpec(NamedTuple):
    """Task-specific quadratic/hinge terms on top of the kinetic physics."""
    stance: jnp.ndarray          # (N, 4) prescribed contact schedule
    anchor_w: jnp.ndarray        # (N, NQ) per-element state anchor weights
    anchor_v: jnp.ndarray        # (N, NQ) state anchor targets
    vel_w: jnp.ndarray           # (N, NQ) weights on (q[t]-q[t-1])/h (t>=1)
    vel_v: jnp.ndarray           # (N, NQ) velocity targets
    box_G: jnp.ndarray           # (R, NQ) bound rows: lo <= G q <= hi
    box_lo: jnp.ndarray          # (R,)
    box_hi: jnp.ndarray          # (R,)
    box_mask: jnp.ndarray        # (R, N) 1.0 where the row applies
    periodic_w: jnp.ndarray      # scalar weight
    periodic_mask: jnp.ndarray   # (NQ,) dims with q[0] == q[N-1]
    periodic_vmask: jnp.ndarray  # (NQ,) dims with dq[0] == dq[N-1]
    lin: jnp.ndarray             # (N, NQ) linear cost coefficients
    h: jnp.ndarray               # scalar timestep


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    eom_weight: float = 1e4
    torque_weight: float = 1.0
    no_slip_penalty: float = 1e3
    foot_height_penalty: float = 1e4
    foot_height_bound: float = 0.01   # stance feet within 1 cm of ground
    clearance_penalty: float = 1e6    # feet never below the ground
    box_penalty: float = 1e4
    max_iters: int = 200


def _dummy_kinetic_data(N: int, h: float, stance: np.ndarray,
                        dtype=jnp.float64) -> kn.KineticData:
    """Measurement-free KineticData: one zero-weight camera, no priors."""
    cam = kin.CameraSet(K=jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                           (1, 3, 3)),
                        D=jnp.zeros((1, 4), dtype),
                        R=jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                           (1, 3, 3)),
                        t=jnp.asarray([[0.0, 0.0, 10.0]], dtype))
    base = kin.KinematicData(
        meas=jnp.zeros((N, 1, 24, 2, 1), dtype),
        weight=jnp.zeros((N, 1, 24, 1), dtype),
        cam=cam, h=jnp.asarray(h, dtype),
        acc_weight=jnp.zeros((NQ,), dtype),
        frame_valid=jnp.ones((N,), dtype),
        gmm=kin.GMMPrior(means=jnp.zeros((1, 22), dtype),
                         prec=jnp.broadcast_to(jnp.eye(22, dtype=dtype),
                                               (1, 22, 22)),
                         log_norm=jnp.zeros((1,), dtype)),
        ar=kin.ARAnchor(y_pred=jnp.zeros((N, 28), dtype),
                        weight=jnp.zeros((28,), dtype),
                        valid=jnp.zeros((N,), dtype)))
    return kn.KineticData(
        base=base, stance=jnp.asarray(stance, dtype),
        grf_fixed=jnp.zeros((N, 4), dtype),
        grf_xy_fixed=jnp.zeros((N, 4, 4), dtype),
        use_fixed_grf=jnp.asarray(0.0, dtype),
        q_warm=jnp.zeros((N, NQ), dtype))


class TrajectoryTask:
    """LM trajectory optimizer: kinetic physics + TaskSpec terms."""

    def __init__(self, subject: SubjectParams, spec: TaskSpec,
                 config: TaskConfig = TaskConfig()):
        self.subject = subject
        self.spec = spec
        self.config = config
        N = spec.stance.shape[0]
        kcfg = kn.KineticConfig(
            robust=False, use_gmm=False,
            torque_weight=config.torque_weight,
            eom_weight=config.eom_weight,
            no_slip_penalty=config.no_slip_penalty,
            foot_height_penalty=config.foot_height_penalty,
            foot_height_bound=config.foot_height_bound)
        self.fte = kn.KineticFTE(kcfg, subject)
        self.data = _dummy_kinetic_data(
            N, float(spec.h), np.asarray(spec.stance),
            dtype=spec.anchor_w.dtype)

    # -- task cost terms -----------------------------------------------------
    def _extras_cost(self, q: jnp.ndarray) -> jnp.ndarray:
        sp = self.spec
        cfg = self.config
        h = sp.h
        c = jnp.sum(sp.anchor_w * (q - sp.anchor_v) ** 2)
        dq = (q[1:] - q[:-1]) / h
        c = c + jnp.sum(sp.vel_w[1:] * (dq - sp.vel_v[1:]) ** 2)
        # box hinges
        v = jnp.einsum("rj,tj->rt", sp.box_G, q)
        viol = jnp.maximum(v - sp.box_hi[:, None], 0.0) \
            + jnp.maximum(sp.box_lo[:, None] - v, 0.0)
        c = c + cfg.box_penalty * jnp.sum(sp.box_mask * viol * viol)
        # periodicity (state and velocity)
        rp = sp.periodic_mask * (q[-1] - q[0])
        c = c + sp.periodic_w * jnp.sum(rp * rp)
        rv = sp.periodic_vmask * ((q[-1] - q[-2]) - (q[1] - q[0])) / h
        c = c + sp.periodic_w * jnp.sum(rv * rv)
        # ground clearance for all feet at all times
        pts = jax.vmap(lambda qq: dyn.foot_points(qq, self.subject))(q)
        below = jnp.maximum(-pts[..., 2], 0.0)
        c = c + cfg.clearance_penalty * jnp.sum(below * below)
        # linear objective terms (e.g. stopping distance)
        c = c + jnp.sum(sp.lin * q)
        return c

    def _cost(self, q: jnp.ndarray) -> jnp.ndarray:
        eom_c, tau_c, _ = self.fte._physics_costs(q, self.data)
        pen = self.fte._stance_penalties(q, self.data)
        lim = self.fte._kin._limit_cost(q, self.data.base.frame_valid)
        return eom_c + tau_c + pen + lim + self._extras_cost(q)

    # -- normal equations ------------------------------------------------
    def _normal(self, q: jnp.ndarray):
        sp = self.spec
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        h = sp.h

        g = jax.grad(self._cost)(q)

        Hdiag = jnp.zeros((N, NQ, NQ), dtype)
        Hlower = jnp.zeros((kin.BANDWIDTH, N, NQ, NQ), dtype)
        # EOM exact-GN curvature blocks (recomputed at the live q: task
        # solves move far from their starts, so no frozen-GN shortcut here)
        ed, el1, el2 = self.fte.eom_curvature_blocks(q, self.data)
        Hdiag = Hdiag + ed
        Hlower = Hlower.at[0].add(el1)
        Hlower = Hlower.at[1].add(el2)
        # torque quadratic: tau is an implicit function of q; its curvature
        # is folded into the EOM channel above (elimination), LM covers it.
        # state anchors (exact)
        Hdiag = Hdiag + 2.0 * jax.vmap(jnp.diag)(sp.anchor_w)
        # velocity anchors (exact): residual at t couples q[t], q[t-1]
        wv = sp.vel_w / (h * h)
        Hdiag = Hdiag.at[1:].add(2.0 * jax.vmap(jnp.diag)(wv[1:]))
        Hdiag = Hdiag.at[:-1].add(2.0 * jax.vmap(jnp.diag)(wv[1:]))
        Hlower = Hlower.at[0, :-1].add(-2.0 * jax.vmap(jnp.diag)(wv[1:]))
        # box hinge active-set curvature
        v = jnp.einsum("rj,tj->rt", sp.box_G, q)
        active = sp.box_mask * (
            ((v > sp.box_hi[:, None]) | (v < sp.box_lo[:, None]))
            .astype(dtype))
        Hbox = 2.0 * cfg.box_penalty * jnp.einsum(
            "ra,rt,rb->tab", sp.box_G, active, sp.box_G)
        Hdiag = Hdiag + Hbox
        # periodicity: diagonal blocks only (cross block is out of band)
        wp = 2.0 * sp.periodic_w
        Pd = jnp.diag(sp.periodic_mask)
        Pv = jnp.diag(sp.periodic_vmask) / (h * h)
        Hdiag = Hdiag.at[0].add(wp * (Pd + Pv))
        Hdiag = Hdiag.at[-1].add(wp * (Pd + Pv))
        Hdiag = Hdiag.at[1].add(wp * Pv)
        Hdiag = Hdiag.at[-2].add(wp * Pv)
        # clearance + stance foot-height: exact active-set GN curvature via
        # the closed-form foot-point z Jacobian (without it these hinge
        # penalties only reach the gradient and penetration persists)
        from ..models import skeleton as sk
        C_all = jnp.asarray(sk.bottom_coefficients(self.subject), dtype)
        feet_idx = [sk.LINK_INDEX[n] for n in dyn.FEET_LINKS]
        Cfeet = C_all[:, feet_idx, :]
        pts_f, Jf = jax.vmap(
            lambda qt: sk.points_and_jacobian_from_coeffs(qt, Cfeet))(q)
        Jz = Jf[:, :, 2, :]                               # (N, 4, NQ)
        z_f = pts_f[..., 2]                                # (N, 4)
        act_clear = (z_f < 0.0).astype(dtype)
        act_height = jnp.asarray(sp.stance, dtype) * (
            jnp.abs(z_f) > cfg.foot_height_bound).astype(dtype)
        w_feet = 2.0 * (cfg.clearance_penalty * act_clear
                        + cfg.foot_height_penalty * act_height)
        Hdiag = Hdiag + jnp.einsum("tf,tfa,tfb->tab", w_feet, Jz, Jz)
        Hdiag = Hdiag + 1e-2 * jnp.eye(NQ, dtype=dtype)[None]
        G = jnp.asarray(self.fte._kin._G, dtype)
        lo = jnp.asarray(self.fte._kin._lo, dtype)
        hi = jnp.asarray(self.fte._kin._hi, dtype)
        vlim = jnp.einsum("cj,tj->tc", G, q)
        act = ((vlim > hi[None]) | (vlim < lo[None])).astype(dtype)
        Hdiag = Hdiag + 2.0 * self.fte._kin.config.limit_penalty * jnp.einsum(
            "ca,tc,cb->tab", G, act, G)
        return g, banded.BlockBanded(diag=Hdiag, lower=Hlower)

    # -- solve -------------------------------------------------------------
    def solve(self, q0: jnp.ndarray, max_iters: Optional[int] = None,
              ftol: float = 1e-10) -> Dict:
        cfg = gn_mod.LMConfig(max_iters=max_iters or self.config.max_iters,
                              ftol=ftol, lam0=1e0)
        run = jax.jit(lambda qq: gn_mod.lm_solve(
            lambda x: self._cost(x), lambda x: self._normal(x), qq, cfg))
        state = run(jnp.asarray(q0))
        q = state.q
        tau, gz, gxy = self.fte.forces(q, self.data)
        eom_c, tau_c, extras = self.fte._physics_costs(q, self.data)
        dq = jnp.zeros_like(q).at[1:].set((q[1:] - q[:-1]) / self.spec.h)
        return {
            "q": np.asarray(q), "dq": np.asarray(dq),
            "tau": np.asarray(tau), "grf_z": np.asarray(gz),
            "grf_xy": np.asarray(gxy),
            "cost": float(state.cost), "iterations": int(state.it),
            "accepted": int(state.n_accepted),
            "eom_cost": float(eom_c), "torque_cost": float(tau_c),
            "eom_rms_bw": float(jnp.sqrt(jnp.mean(extras[0][2:] ** 2))),
        }


# ---------------------------------------------------------------------------
# Task builders
# ---------------------------------------------------------------------------

def _ang_index(link: str, comp: str) -> int:
    return kin._ang(link, comp)


_LEG_LINKS = ("UFL", "LFL", "HFL", "UFR", "LFR", "HFR",
              "UBL", "LBL", "HBL", "UBR", "LBR", "HBR")
_BODY_SEGMENTS = ("bodyF", "neck")
_ALL_LINKS = ("base", "bodyF", "neck", "tail0", "tail1") + _LEG_LINKS


def _neutral_pose(height: float = 0.55) -> np.ndarray:
    """Standing pose: all link yaws at pi (the skeleton's forward-facing
    convention, see dynamics/simulate.py::drop_pose), base at ``height``."""
    q = np.zeros(NQ)
    q[2] = height
    q[5] = np.pi
    for i in range(1, 17):
        q[3 * i + 5] = np.pi
    return q


# leg thetas putting all four feet on the ground at base height 0.55 with
# zero joint-limit violation (found by grid search over the FK)
_CROUCH_FRONT = (0.5, 0.5, 0.75)
_CROUCH_BACK = (0.75, 0.75, 1.0)


def _crouch_pose(height: float = 0.55) -> np.ndarray:
    """Standing pose with bent legs so the feet rest on the ground (a
    straight-legged stand at 0.55 m would start the feet well below it)."""
    q = _neutral_pose(height)
    for legs, (a, b, c) in ((("UFL", "LFL", "HFL"), _CROUCH_FRONT),
                            (("UFR", "LFR", "HFR"), _CROUCH_FRONT),
                            (("UBL", "LBL", "HBL"), _CROUCH_BACK),
                            (("UBR", "LBR", "HBR"), _CROUCH_BACK)):
        th, ca, ho = legs
        q[_ang_index(th, "theta")] = a
        q[_ang_index(ca, "theta")] = b
        q[_ang_index(ho, "theta")] = c
    return q


def _box_rows(rows: list, link: str, comp: str, lo: float, hi: float,
              mask: np.ndarray, center: float = 0.0):
    g = np.zeros(NQ)
    g[_ang_index(link, comp)] = 1.0
    rows.append((g, center + lo, center + hi, mask))


def _pack_boxes(rows: list, N: int):
    G = np.stack([r[0] for r in rows])
    lo = np.array([r[1] for r in rows])
    hi = np.array([r[2] for r in rows])
    mask = np.stack([np.broadcast_to(r[3], (N,)) for r in rows]).astype(float)
    return G, lo, hi, mask


def high_speed_stop(subject: Optional[SubjectParams] = None,
                    initial_vel: float = 10.0, n_frames: int = 40,
                    h: float = 0.02, minimize_distance: bool = False,
                    settle_frames: int = 10,
                    config: TaskConfig = TaskConfig(foot_height_bound=0.03),
                    max_iters: Optional[int] = None, seed: int = 0) -> Dict:
    """Plan a stop from ``initial_vel`` m/s (reference cheetah.py:360-486).

    Boundary conditions follow the reference: start at the origin at speed,
    end at rest in a standard posture; feet are driven to the ground after
    ``settle_frames`` (the reference bounds foot_height <= 0.01 there) and
    the body height is capped at 0.6 m. With ``minimize_distance`` the final
    x position enters the objective with weight 1e-4 (cheetah.py:481-485).
    """
    subject = subject or params_mod.get_subject("acinoset")
    N = n_frames
    rng = np.random.default_rng(seed)
    after = np.arange(N) >= settle_frames
    always = np.ones(N, bool)
    last = np.arange(N) == N - 1

    stance = np.zeros((N, 4))
    stance[settle_frames:, :] = 1.0

    anchor_w = np.zeros((N, NQ))
    anchor_v = np.zeros((N, NQ))
    # start at the origin
    anchor_w[0, 0:2] = 1e6
    # z capped (box) but anchored softly to leg height early on
    anchor_w[0, 2] = 1e4
    anchor_v[0, 2] = 0.55

    vel_w = np.zeros((N, NQ))
    vel_v = np.zeros((N, NQ))
    # start at speed (negative x: the skeleton's forward-facing convention)
    vel_w[1, 0] = 1e6
    vel_v[1, 0] = -initial_vel
    # end at rest: all state derivatives zero on the last step
    vel_w[-1, :] = 1e6

    rows: list = []
    # y-plane bound +-0.2
    gy = np.zeros(NQ)
    gy[1] = 1.0
    rows.append((gy, -0.2, 0.2, always))
    gz = np.zeros(NQ)
    gz[2] = 1.0
    rows.append((gz, 0.25, 0.6, after))
    for link in _ALL_LINKS:
        # phi about 0; psi about the pi yaw convention
        rows_mask = always
        _box_rows(rows, link, "phi", -np.pi / 4, np.pi / 4, rows_mask)
        _box_rows(rows, link, "psi", -np.pi / 4, np.pi / 4, rows_mask,
                  center=np.pi)
    crouch = _crouch_pose()
    for link in _LEG_LINKS:
        c0 = crouch[_ang_index(link, "theta")]
        _box_rows(rows, link, "theta", -np.radians(60), np.radians(60),
                  always, center=c0)
        # end in a standard (standing) position: +-20 deg about the stand
        _box_rows(rows, link, "theta", -np.radians(20), np.radians(20), last,
                  center=c0)
    for link in _BODY_SEGMENTS:
        _box_rows(rows, link, "theta", -np.radians(45), np.radians(45),
                  always)
        _box_rows(rows, link, "theta", -np.radians(10), np.radians(10), last)
    for link in _ALL_LINKS:
        _box_rows(rows, link, "phi", -np.radians(5), np.radians(5), last)
        _box_rows(rows, link, "psi", -np.radians(5), np.radians(5), last,
                  center=np.pi)
    G, lo_v, hi_v, mask = _pack_boxes(rows, N)

    lin = np.zeros((N, NQ))
    if minimize_distance:
        # the run is toward -x, so distance = -x[N-1]; weight 1e-4 as in the
        # reference add_costs(distance_cost=0.0001 * x_final)
        lin[-1, 0] = 1e-4 * subject.total_mass * dyn.GRAVITY

    spec = TaskSpec(
        stance=jnp.asarray(stance), anchor_w=jnp.asarray(anchor_w),
        anchor_v=jnp.asarray(anchor_v), vel_w=jnp.asarray(vel_w),
        vel_v=jnp.asarray(vel_v), box_G=jnp.asarray(G),
        box_lo=jnp.asarray(lo_v), box_hi=jnp.asarray(hi_v),
        box_mask=jnp.asarray(mask), periodic_w=jnp.asarray(0.0),
        periodic_mask=jnp.zeros(NQ), periodic_vmask=jnp.zeros(NQ),
        lin=jnp.asarray(lin), h=jnp.asarray(h))

    # init: decelerating ramp toward -x at standing height (feet on the
    # ground), small random theta jitter to break symmetry (reference
    # cheetah.py:425-427)
    q0 = np.tile(_crouch_pose(), (N, 1))
    t = np.arange(N) / (N - 1)
    total_time = (N - 1) * h
    q0[:, 0] = -total_time * (initial_vel / 2) * (2 * t - t ** 2)
    # jitter only the pre-settle (flight) frames: the settled window starts
    # feasible (feet planted by the crouch), which the tight [0, bound]
    # stance corridor needs to converge quickly
    for i in range(17):
        q0[:settle_frames, 3 * i + 4] += rng.normal(
            0, np.radians(5), size=settle_frames)

    task = TrajectoryTask(subject, spec, config)
    out = task.solve(q0, max_iters=max_iters)
    out["final_speed"] = float(np.linalg.norm(out["dq"][-1, :3]))
    out["stop_distance"] = float(abs(out["q"][-1, 0] - out["q"][0, 0]))
    return out


def sin_around_touchdown(mid_frame: int, n_frames: int,
                         amplitude_d: float = 25.0) -> np.ndarray:
    """Leg-swing initialization: one sinusoid period peaking at touchdown
    (reconstruction of pe.init_tools.sin_around_touchdown, used at
    cheetah.py:559-563)."""
    t = np.arange(n_frames, dtype=float)
    return np.radians(amplitude_d) * np.sin(
        2.0 * np.pi * (t - mid_frame) / n_frames)


# reference default for 14 m/s (cheetah.py docstring at 489-499)
GALLOP_FOOT_ORDER = ((1, 7), (6, 13), (31, 38), (25, 32))


def periodic_gallop(subject: Optional[SubjectParams] = None,
                    avg_vel: float = 14.0,
                    foot_order: Sequence[Tuple[int, int]] = GALLOP_FOOT_ORDER,
                    n_frames: int = 44, h: float = 0.01,
                    config: TaskConfig = TaskConfig(),
                    max_iters: Optional[int] = None, seed: int = 0) -> Dict:
    """Plan one periodic gallop stride at ``avg_vel`` m/s with the contact
    windows of ``foot_order`` (reference cheetah.py:489-650): periodic in
    every state but the direction of travel, final x displacement fixed to
    avg_vel * total_time.

    foot_order entries are one-based (touchdown, liftoff) finite elements for
    (HFL, HFR, HBL, HBR), matching prescribe_contact_order.
    """
    subject = subject or params_mod.get_subject("acinoset")
    N = n_frames
    rng = np.random.default_rng(seed)
    total_time = (N - 1) * h
    always = np.ones(N, bool)

    stance = np.zeros((N, 4))
    for i, (td, lo_fe) in enumerate(foot_order):
        stance[max(td - 1, 0):min(lo_fe, N), i] = 1.0

    anchor_w = np.zeros((N, NQ))
    anchor_v = np.zeros((N, NQ))
    anchor_w[0, 0:2] = 1e6                      # start at the origin
    anchor_w[-1, 0] = 1e6                       # final x displacement fixed
    anchor_v[-1, 0] = -avg_vel * total_time     # run toward -x

    vel_w = np.zeros((N, NQ))
    vel_v = np.zeros((N, NQ))
    vel_w[1:, 0] = 1e0                          # soft forward-speed shaping
    vel_v[1:, 0] = -avg_vel

    rows: list = []
    gy = np.zeros(NQ)
    gy[1] = 1.0
    rows.append((gy, -0.2, 0.2, always))
    gz = np.zeros(NQ)
    gz[2] = 1.0
    rows.append((gz, 0.3, 0.7, always))         # never fallen over
    for link in _ALL_LINKS:
        _box_rows(rows, link, "phi", -np.radians(15), np.radians(15), always)
        _box_rows(rows, link, "psi", -np.radians(10), np.radians(10), always,
                  center=np.pi)
    for link in ("base", "bodyF", "neck"):
        _box_rows(rows, link, "theta", -np.radians(45), np.radians(45),
                  always)
    for link in ("tail0", "tail1") + _LEG_LINKS:
        _box_rows(rows, link, "theta", -np.radians(90), np.radians(90),
                  always)
    G, lo_v, hi_v, mask = _pack_boxes(rows, N)

    periodic_mask = np.ones(NQ)
    periodic_mask[0] = 0.0                      # x advances by one stride
    periodic_vmask = np.ones(NQ)

    spec = TaskSpec(
        stance=jnp.asarray(stance), anchor_w=jnp.asarray(anchor_w),
        anchor_v=jnp.asarray(anchor_v), vel_w=jnp.asarray(vel_w),
        vel_v=jnp.asarray(vel_v), box_G=jnp.asarray(G),
        box_lo=jnp.asarray(lo_v), box_hi=jnp.asarray(hi_v),
        box_mask=jnp.asarray(mask), periodic_w=jnp.asarray(1e5),
        periodic_mask=jnp.asarray(periodic_mask),
        periodic_vmask=jnp.asarray(periodic_vmask),
        lin=jnp.zeros((N, NQ)), h=jnp.asarray(h))

    # init: constant-velocity ramp, standing height (feet on the ground),
    # sinusoidal leg swings around each touchdown superimposed on the stand
    # (reference cheetah.py:536-566)
    q0 = np.tile(_crouch_pose(), (N, 1))
    t = np.arange(N) / (N - 1)
    q0[:, 0] = -avg_vel * total_time * t
    q0[:, _ang_index("base", "theta")] += rng.normal(0, np.radians(5),
                                                     size=N)
    for i, ((td, lo_fe), (upper, lower)) in enumerate(zip(
            foot_order, (("UFL", "LFL"), ("UFR", "LFR"),
                         ("UBL", "LBL"), ("UBR", "LBR")))):
        swing = sin_around_touchdown(int((td + lo_fe) / 2), N)
        off = np.radians(-15 if upper[1] == "F" else 15)
        q0[:, _ang_index(upper, "theta")] += swing
        q0[:, _ang_index(lower, "theta")] += swing + off

    task = TrajectoryTask(subject, spec, config)
    out = task.solve(q0, max_iters=max_iters)
    out["stride_length"] = float(abs(out["q"][-1, 0] - out["q"][0, 0]))
    out["avg_speed"] = out["stride_length"] / total_time
    per = np.abs(periodic_mask * (out["q"][-1] - out["q"][0]))
    out["periodicity_error"] = float(per.max())
    return out
