"""Kinematic FTE: trajectory estimation as a robust nonlinear least-squares
problem over q in R^(N x 54), solved by damped Gauss-Newton on a block-banded
normal system.

Mirrors the reference objective (``acinoset_opt.py:539-635``):

  cost = 1e-3 * ( measurement + const-acc model + [GMM pose] + [AR motion] )

with joint-limit box constraints (``cheetah.py:203-356``) as quadratic hinge
penalties. The implicit-Euler collocation variables dq/ddq of the reference
are eliminated exactly: with q[n] = q[n-1] + h dq[n] and dq[n] = dq[n-1] +
h ddq[n], the constant-acceleration slack w[n] = ddq[n] - ddq[n-1] is the
third difference of q, so the state is q alone and the normal matrix is
block-banded with bandwidth 3.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import skeleton as sk
from ..models.params import SubjectParams
from ..ops import banded, camera, losses

NQ = 54
BANDWIDTH = 3
# third-difference stencil coefficients: w[t] = (q[t] -3q[t-1] +3q[t-2] -q[t-3])/h^2
_ACC_STENCIL = np.array([1.0, -3.0, 3.0, -1.0])
# paw-marker rows of the 24-marker FK, ordered like dynamics.eom.FOOT_NAMES
# (HFL, HFR, HBL, HBR) so stance matrices from pipeline.contacts line up
_PAW_IDX = np.array([sk.MARKERS.index(m) for m in
                     ("l_front_paw", "r_front_paw",
                      "l_back_paw", "r_back_paw")])


class CameraSet(NamedTuple):
    """Stacked calibrated cameras. Shapes: K (C,3,3), D (C,4), R (C,3,3), t (C,3)."""
    K: jnp.ndarray
    D: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray


class GMMPrior(NamedTuple):
    """Gaussian-mixture pose prior over the 22 relative joint angles
    (reference ``gmm_pose_cost``, acinoset_misc.py:680-714)."""
    means: jnp.ndarray      # (K, 22)
    prec: jnp.ndarray       # (K, 22, 22) inverse covariances
    log_norm: jnp.ndarray   # (K,) log w_k - 0.5 log det(2 pi Sigma_k)


class ARAnchor(NamedTuple):
    """Fixed linear-motion-model predictions (reference
    ``add_linear_motion_model``: y_pred computed once from the initial values,
    acinoset_misc.py:316-328)."""
    y_pred: jnp.ndarray   # (N, 28)
    weight: jnp.ndarray   # (28,) = 1/sigma^2_resid (0 -> disabled dim)
    valid: jnp.ndarray    # (N,) 1.0 for frames with an active constraint


class KinematicData(NamedTuple):
    """Per-trial arrays (a pytree: vmap/shard over leading batch dims)."""
    meas: jnp.ndarray         # (N, C, L, 2, W) pixel measurements
    weight: jnp.ndarray       # (N, C, L, W) 1/R weights, likelihood-gated
    cam: CameraSet
    h: jnp.ndarray            # scalar timestep = 1/fps
    acc_weight: jnp.ndarray   # (54,) model error weights 1/Q (0 = free dim)
    frame_valid: jnp.ndarray  # (N,) 1.0 for real frames, 0.0 for padding
    gmm: GMMPrior
    ar: ARAnchor
    # shutter-delay correction (reference acinoset_misc.py:180-286): camera c
    # observes the scene tau_c seconds late; the 3D pose is advanced along
    # the base velocity/acceleration. sd_vel/sd_acc hold those base
    # derivatives from the current outer-iteration trajectory (the reference
    # couples them as live collocation variables; here they are lagged
    # constants refreshed between alternating solves — the correction is
    # second-order small). Defaults disable the feature.
    # numpy defaults: jnp here would initialize the device backend at
    # import time (hangs imports when the accelerator is unreachable)
    sd_tau: jnp.ndarray = np.zeros(1)        # (C,)
    sd_vel: jnp.ndarray = np.zeros((1, 3))   # (N, 3)
    sd_acc: jnp.ndarray = np.zeros((1, 3))   # (N, 3)
    # ground-plane depth anchor (monocular): the reference only ever sees the
    # calibrated ground_plane_height in its PHYSICS stage (foot constraints,
    # acinoset_opt.py:500); exposing it to the kinematic/data-driven solves
    # attacks the dominant monocular error — global depth — directly.
    # ``stance_w`` is a per-frame per-foot confidence from contact detection
    # (pipeline.contacts); zero weights (the default) disable every term.
    ground_z: jnp.ndarray = np.zeros(())     # scalar plane elevation [m]
    stance_w: jnp.ndarray = np.zeros((1, 4))  # (N, 4) in [0, 1]
    # per-trial GMM gate weight: multiplies the pose-prior term so ONE
    # compiled solver serves gate-accepted (1.0) and gate-rejected (0.0)
    # trials in the same vmapped batch — the rejected trials then still
    # carry the AR motion prior (the reference's motion model runs on
    # EVERY data-driven trial, acinoset_misc.py:291-336; only the pose
    # manifold is confidence-gated here)
    gmm_scale: jnp.ndarray = np.ones(())
    # base-pose anchor (data-driven bootstrap): reference (N, 6) base
    # translation+orientation the GMM/AR-constrained solves are pinned to.
    # Round-5 forced-vs-gated study (docs/artifacts/forced_vs_gated.csv):
    # the GMM pose prior's damage is almost entirely GLOBAL — it pulls
    # joints toward the learned manifold and the measurement term
    # compensates by dragging base depth (per-trial MPE +90..+150 mm at
    # near-unchanged MPJPE, CoM-vel worse on 10/10 trials). Pinning the
    # base to the prior-free solution lets the prior fix pose without
    # corrupting depth. Active only when config.base_anchor_trans/rot > 0.
    base_ref: jnp.ndarray = np.zeros((1, 6))  # (N, 6)


@dataclasses.dataclass(frozen=True)
class KinematicConfig:
    fisheye: bool = True
    robust: bool = True           # redescending vs plain quadratic (hand-labeled)
    # robust loss shape: "redescending" (reference three-part, outliers get
    # ZERO influence — right for the kinematic stages where corrupted DLC
    # tracks must be fully rejected) or "huber" (linear tail, influence
    # never vanishes — required by the kinetic stage so the dominant EOM
    # term cannot drag the solve out of the measurement basin for a
    # bounded, saturated cost; see ops.losses.huber)
    loss: str = "redescending"
    use_gmm: bool = False
    use_ar: bool = False
    kinetic_dataset: bool = False
    limit_penalty: float = 1e5
    curvature_floor: float = 1e-3
    cam_multipliers: Tuple[float, ...] = ()  # kinetic: (1,1,.6,.6)
    # live shutter-delay coupling (reference acinoset_misc.py:278-288): the
    # per-camera reprojection advances the pose by tau*dq + tau^2*ddq of the
    # base, with dq/ddq the CURRENT trajectory's finite differences (exact
    # gradient via the chain rule through the shift). False keeps the lagged
    # sd_vel/sd_acc constants refreshed between alternating solves.
    live_shutter: bool = False
    # joint-manifold penalty weight (reference revolute/Hooke joints,
    # sk.joint_residuals — present in the reference's KINEMATIC model too,
    # cheetah.py:71-73,101,160-161). 0 disables. Continuation-scaled by
    # (1/s)^4 across the annealing stages — soft manifold early, tight at
    # s=1. Round-2 measured: enforcing it nearly TRIPLES monocular
    # data-driven accuracy on corrupted synthetic trials (MPJPE ~98 -> ~37,
    # CoM-velocity RMSE ~1.9 -> 0.6-1.5): the removed lateral-leg pseudo-
    # DOFs were overfitting corrupted detections.
    weld_weight: float = 1e6
    # ground-plane anchor weights (active only when KinematicData.stance_w /
    # ground_z are populated by the pipeline's contact-detection pass):
    #   ground_weight      — quadratic pull of stance-foot z onto the plane
    #                        (1/m^2; 2e4 ~ sigma_z of 7 mm)
    #   penetration_weight — one-sided hinge keeping EVERY foot above the
    #                        plane on all valid frames
    #   noslip_weight      — stance feet are stationary in xy: quadratic on
    #                        the frame-to-frame paw displacement (couples
    #                        q_t, q_{t-1} through the banded lower block) —
    #                        pins global translation against monocular
    #                        depth wobble
    ground_weight: float = 0.0
    penetration_weight: float = 0.0
    noslip_weight: float = 0.0
    # base-pose anchor weights (active with KinematicData.base_ref): pin
    # the 6 base DOF to a reference trajectory — the data-driven bootstrap
    # pins them to the prior-free solve (see KinematicData.base_ref).
    # trans in m^-2 (4e2 ~ sigma 5 cm), rot in rad^-2 (1e2 ~ sigma 0.1 rad)
    base_anchor_trans: float = 0.0
    base_anchor_rot: float = 0.0
    # absolute Tikhonov floor on the normal matrix diagonal. The skeleton has
    # exactly one unobservable DOF per leg/tail segment (rotation about the
    # cylinder axis: markers sit on the axis, and the reference gives those
    # dims zero motion-model weight, acinoset_misc.py:1865-1906). Without an
    # absolute floor those dims take unbounded steps and make the optimizer
    # path chaotic; 1e-2 is negligible against observable curvatures (1e1-1e7)
    # but pins free dims in place. IPOPT plays the same trick via its
    # inertia-correction delta_w.
    tikhonov: float = 1e-2


# ---------------------------------------------------------------------------
# Joint-limit tables (reference cheetah.py:203-356, absolute-angle branch)
# ---------------------------------------------------------------------------

def _ang(link: str, comp: str) -> int:
    i = sk.LINK_INDEX[link]
    base = 3 if i == 0 else 3 * i + 3
    return base + {"phi": 0, "theta": 1, "psi": 2}[comp]


def joint_limit_table(kinetic_dataset: bool = False):
    """Rows (g, lo, hi) with lo <= g . q <= hi."""
    PI = np.pi
    rows = []

    def rel(a, b, comp, lo, hi):
        g = np.zeros(NQ)
        g[_ang(a, comp)] += 1.0
        g[_ang(b, comp)] -= 1.0
        rows.append((g, lo, hi))

    def absq(a, comp, lo, hi):
        g = np.zeros(NQ)
        g[_ang(a, comp)] += 1.0
        rows.append((g, lo, hi))

    if kinetic_dataset:
        rel("neck", "bodyF", "psi", -0.05, 0.05)
        rel("neck", "bodyF", "phi", -0.05, 0.05)
        absq("base", "phi", -0.05, 0.05)
        rel("bodyF", "base", "psi", -0.1, 0.1)
        rel("bodyF", "base", "phi", -0.1, 0.1)
        rel("base", "tail0", "psi", -0.1, 0.1)
    else:
        rel("neck", "bodyF", "psi", -PI / 6, PI / 6)
        rel("neck", "bodyF", "phi", -PI / 6, PI / 6)
        absq("base", "phi", -PI / 6, PI / 6)
        rel("bodyF", "base", "psi", -PI / 6, PI / 6)
        rel("bodyF", "base", "phi", -PI / 6, PI / 6)
        rel("base", "tail0", "psi", -PI / 1.5, PI / 1.5)
    rel("neck", "bodyF", "theta", -PI / 6, PI / 6)
    rel("bodyF", "base", "theta", -PI / 6, PI / 6)
    rel("base", "tail0", "theta", -PI / 1.5, PI / 1.5)
    rel("tail0", "tail1", "theta", -PI / 1.5, PI / 1.5)
    rel("tail0", "tail1", "psi", -PI / 1.5, PI / 1.5)
    for body, thigh, calf, hock, name in (
            ("bodyF", "UFL", "LFL", "HFL", "FL"),
            ("bodyF", "UFR", "LFR", "HFR", "FR"),
            ("base", "UBL", "LBL", "HBL", "BL"),
            ("base", "UBR", "LBR", "HBR", "BR")):
        rel(body, thigh, "theta", -0.75 * PI, 0.75 * PI)
        lo, hi = (0.0, PI) if name.startswith("B") else (-PI, 0.0)
        rel(thigh, calf, "theta", lo, hi)
        lo, hi = (-0.75 * PI, 0.0) if name.startswith("B") else (-PI / 4,
                                                                 0.75 * PI)
        rel(calf, hock, "theta", lo, hi)
    G = np.stack([r[0] for r in rows])
    lo = np.array([r[1] for r in rows])
    hi = np.array([r[2] for r in rows])
    return G, lo, hi


# The reference's revolute/Hooke joint equalities live in
# models.skeleton.joint_residuals — they are NONLINEAR in Euler
# coordinates (the relative rotation must be a pure y-rotation), so no
# linear G-row table can express them.


# ---------------------------------------------------------------------------
# Constant-acceleration (third difference) banded quadratic
# ---------------------------------------------------------------------------

def acc_banded(h: jnp.ndarray, acc_weight: jnp.ndarray,
               frame_valid: jnp.ndarray) -> banded.BlockBanded:
    """H = nabla^2 of sum_t sum_p W_p w[t,p]^2 (factor 2 included).

    w[t] valid for t >= 3 and when all four stencil frames are real.
    Returns block-banded (N, 54) structure with diagonal weight blocks.
    """
    N = frame_valid.shape[0]
    dtype = acc_weight.dtype
    c = jnp.asarray(_ACC_STENCIL, dtype)
    # residual validity: frames t-3..t all real and t >= 3
    v = frame_valid
    res_valid = jnp.zeros(N, dtype)
    if N > 3:
        rv = v[3:] * v[2:-1] * v[1:-2] * v[:-3]
        res_valid = res_valid.at[3:].set(rv)
    w = 2.0 * acc_weight / h**4  # factor 2: nabla^2 of quadratic
    # diag[t] = sum_a c_a^2 * res_valid[t+a] (residual at frame t+a uses q[t] with
    # coefficient c_a)
    diag_coef = jnp.zeros(N, dtype)
    low_coef = [jnp.zeros(N, dtype) for _ in range(BANDWIDTH)]
    for a in range(4):
        # residual index r = t + a must be within [0, N)
        seg = jnp.zeros(N, dtype)
        if N - a > 0:
            seg = seg.at[:N - a].set(res_valid[a:])
        diag_coef = diag_coef + c[a] * c[a] * seg
        for k in range(1, BANDWIDTH + 1):
            b = a + k
            if b > 3:
                continue
            segk = jnp.zeros(N, dtype)
            if N - b > 0:
                segk = segk.at[:N - b].set(res_valid[b:])
            # H[t+k, t] += c_a c_b res_valid[t+b]  with r = t+b, r-a = t+k
            low_coef[k - 1] = low_coef[k - 1] + c[a] * c[b] * segk
    eyeW = jnp.diag(w)
    diag = diag_coef[:, None, None] * eyeW[None]
    lower = jnp.stack([lc[:, None, None] * eyeW[None] for lc in low_coef])
    return banded.BlockBanded(diag=diag, lower=lower)


def acc_cost(q: jnp.ndarray, h: jnp.ndarray, acc_weight: jnp.ndarray,
             frame_valid: jnp.ndarray) -> jnp.ndarray:
    N = q.shape[0]
    if N <= 3:
        return jnp.zeros((), q.dtype)
    w3 = (q[3:] - 3 * q[2:-1] + 3 * q[1:-2] - q[:-3]) / h**2
    rv = (frame_valid[3:] * frame_valid[2:-1] * frame_valid[1:-2]
          * frame_valid[:-3])
    return jnp.sum(rv[:, None] * acc_weight[None, :] * w3 * w3)


# ---------------------------------------------------------------------------
# Problem factory
# ---------------------------------------------------------------------------

class KinematicFTE:
    """Jit-compiled cost/normal functions for one (config, subject) pair.

    Instances are cheap; arrays live in ``KinematicData`` so a single compiled
    function serves every trial of the same shape (and vmaps over batches).
    """

    def __init__(self, config: KinematicConfig, subject: SubjectParams):
        self.config = config
        self.subject = subject
        G, lo, hi = joint_limit_table(config.kinetic_dataset)
        self._G = G
        self._lo = lo
        self._hi = hi
        self._A22 = sk.A_REL[6:]  # (22, 54) relative joint angles
        self._A28 = sk.A_REL      # (28, 54)
        self._ground_on = (config.ground_weight > 0.0
                           or config.penetration_weight > 0.0
                           or config.noslip_weight > 0.0)
        self.cost = jax.jit(self._cost)
        self.normal = jax.jit(self._normal)
        self._solve_cache = {}

    def _meas_loss(self, s):
        """(loss fn, annealed params) of the configured measurement loss."""
        if self.config.loss == "huber":
            return losses.huber, (3.0 * s,)
        return losses.redescending, (3.0 * s, 10.0 * s, 20.0 * s)

    # -- measurement ---------------------------------------------------------
    def _project(self, pts: jnp.ndarray, cam: CameraSet,
                 shift: jnp.ndarray | None = None) -> jnp.ndarray:
        proj = camera.project_fisheye if self.config.fisheye else \
            camera.project_pinhole
        if shift is None:
            return jax.vmap(lambda K, D, R, t: proj(pts, K, D, R, t))(
                cam.K, cam.D, cam.R, cam.t)  # (C, 24, 2)
        return jax.vmap(lambda K, D, R, t, sft: proj(pts + sft[None, :],
                                                     K, D, R, t))(
            cam.K, cam.D, cam.R, cam.t, shift)

    @staticmethod
    def _base_derivatives(q: jnp.ndarray,
                          h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Implicit-Euler base velocity/acceleration from the trajectory:
        vel[t] = (qb[t]-qb[t-1])/h, acc[t] = (vel[t]-vel[t-1])/h (zeros for
        the first one/two frames, matching the collocation convention)."""
        qb = q[:, :3]
        vel = jnp.zeros_like(qb).at[1:].set((qb[1:] - qb[:-1]) / h)
        acc = jnp.zeros_like(qb).at[2:].set((vel[2:] - vel[1:-1]) / h)
        return vel, acc

    def _shutter_shift(self, data: KinematicData, N: int,
                       q: jnp.ndarray = None) -> jnp.ndarray:
        """(N, C, 3) per-frame per-camera world shift tau*vel + tau^2*acc.

        With ``config.live_shutter`` the base derivatives come from the
        current ``q`` (live coupling, reference acinoset_misc.py:278-288);
        otherwise from the lagged ``sd_vel``/``sd_acc`` constants."""
        tau = data.sd_tau
        C = data.meas.shape[1]
        if self.config.live_shutter and q is not None:
            vel, acc = self._base_derivatives(q, data.h)
        else:
            vel, acc = data.sd_vel, data.sd_acc
        shift = (vel[:, None, :] * tau[None, :, None]
                 + acc[:, None, :] * (tau ** 2)[None, :, None])
        return jnp.broadcast_to(shift, (N, C, 3))

    def _meas_weights(self, data: KinematicData) -> jnp.ndarray:
        """(N, C, L, 1, W) weights incl. camera uncertainty multipliers."""
        w = data.weight[:, :, :, None, :]
        if self.config.cam_multipliers:
            m = jnp.asarray(self.config.cam_multipliers,
                            dtype=w.dtype)[: w.shape[1]]
            w = w * m[None, :, None, None, None]
        return w * data.frame_valid[:, None, None, None, None]

    # -- full cost -----------------------------------------------------------
    def _cost(self, q: jnp.ndarray, data: KinematicData,
              loss_scale: jnp.ndarray = 1.0) -> jnp.ndarray:
        # The cost is the LM accept/reject arbiter: bf16 matmul noise here
        # (~0.4% of a several-thousand objective) would randomly reject good
        # steps, tripling the iteration count. Full f32 products are cheap on
        # this path (small einsums), so force them.
        with jax.default_matmul_precision("highest"):
            return self._cost_impl(q, data, loss_scale)

    def cost_terms(self, q: jnp.ndarray, data: KinematicData,
                   loss_scale: jnp.ndarray = 1.0) -> dict:
        """Per-term cost values {measurement, model, pose, motion, limit}
        (the reference's ``costs`` dict printed by ``solution_details``,
        acinoset_opt.py:388-398)."""
        cfg = self.config
        w_all = self._meas_weights(data)
        s = jnp.asarray(loss_scale, q.dtype)

        shift = self._shutter_shift(data, q.shape[0], q)

        def frame_meas_cost(q_t, meas_t, w_t, shift_t):
            pts = sk.fk_markers_linear(q_t, self.subject)
            uv = self._project(pts, data.cam, shift_t)
            res = uv[..., None] - meas_t
            if cfg.robust:
                loss_fn, params = self._meas_loss(s)
                return jnp.sum(loss_fn(w_t * res, *params))
            return jnp.sum((w_t * res) ** 2)

        meas = jnp.sum(jax.vmap(frame_meas_cost)(q, data.meas, w_all, shift))
        model = acc_cost(q, data.h, data.acc_weight, data.frame_valid)
        pose = jnp.zeros((), q.dtype)
        motion = jnp.zeros((), q.dtype)
        if cfg.use_gmm:
            x22 = jnp.einsum("ij,tj->ti", jnp.asarray(self._A22, q.dtype), q)
            pose = data.gmm_scale.astype(q.dtype) * jnp.sum(
                data.frame_valid * self._gmm_neglog(x22, data.gmm))
        if cfg.use_ar:
            x28 = jnp.einsum("ij,tj->ti", jnp.asarray(self._A28, q.dtype), q)
            r = x28 - data.ar.y_pred
            motion = jnp.sum(data.ar.valid[:, None] * data.ar.weight[None, :]
                             * r * r)
        penalty = self._limit_cost(q, data.frame_valid)
        if self._ground_on:
            N = q.shape[0]
            fv = data.frame_valid
            paw = jax.vmap(lambda qt: sk.fk_markers_linear(
                qt, self.subject)[jnp.asarray(_PAW_IDX)])(q)      # (N, 4, 3)
            fz = paw[..., 2]
            gzv = data.ground_z.astype(q.dtype)
            sw = jnp.broadcast_to(data.stance_w.astype(q.dtype),
                                  (N, 4)) * fv[:, None]
            gcost = jnp.zeros((), q.dtype)
            if cfg.ground_weight > 0.0:
                r = fz - gzv
                gcost = gcost + cfg.ground_weight * jnp.sum(sw * r * r)
            if cfg.penetration_weight > 0.0:
                pen = jnp.maximum(gzv - fz, 0.0)
                gcost = gcost + cfg.penetration_weight * jnp.sum(
                    fv[:, None] * pen * pen)
            if cfg.noslip_weight > 0.0:
                dxy = paw[1:, :, :2] - paw[:-1, :, :2]            # (N-1,4,2)
                wns = cfg.noslip_weight * sw[1:] * sw[:-1]
                gcost = gcost + jnp.sum(wns * jnp.sum(dxy * dxy, -1))
            penalty = penalty + gcost
        if cfg.weld_weight > 0.0:
            # continuation: soft manifold at wide annealing scales, tight at
            # s=1 (same rationale as the kinetic EOM ramp — a full-weight
            # nonlinear equality penalty at the start of a GNC solve traps
            # the path in whatever on-manifold basin is nearest the init)
            rw = jax.vmap(lambda qt: sk.joint_residuals(qt))(q)
            penalty = penalty + (1.0 / s)**4 * cfg.weld_weight * jnp.sum(
                data.frame_valid[:, None] * rw * rw)
        if cfg.base_anchor_trans > 0.0 or cfg.base_anchor_rot > 0.0:
            wb = jnp.asarray([cfg.base_anchor_trans] * 3
                             + [cfg.base_anchor_rot] * 3, q.dtype)
            rb = q[:, :6] - jnp.broadcast_to(
                data.base_ref.astype(q.dtype), (q.shape[0], 6))
            penalty = penalty + jnp.sum(
                data.frame_valid[:, None] * wb[None, :] * rb * rb)
        return {"measurement": meas, "model": model, "pose": pose,
                "motion": motion, "limit": penalty}

    def _cost_impl(self, q: jnp.ndarray, data: KinematicData,
                   loss_scale: jnp.ndarray = 1.0) -> jnp.ndarray:
        terms = self.cost_terms(q, data, loss_scale)
        return (terms["measurement"] + terms["model"] + terms["pose"]
                + terms["motion"] + terms["limit"])

    def objective(self, q: jnp.ndarray, data: KinematicData) -> jnp.ndarray:
        """Reference-scaled objective (1e-3 factor, without limit penalty) for
        parity with the reported ``obj_cost`` (acinoset_opt.py:602)."""
        return 1e-3 * (self.cost(q, data)
                       - self._limit_cost(q, data.frame_valid))

    # -- GMM -----------------------------------------------------------------
    def _gmm_logpdf_terms(self, x22, gmm: GMMPrior):
        dx = x22[:, None, :] - gmm.means[None, :, :]          # (N, K, 22)
        quad = jnp.einsum("nki,kij,nkj->nk", dx, gmm.prec, dx)
        return gmm.log_norm[None, :] - 0.5 * quad             # (N, K)

    def _gmm_neglog(self, x22, gmm: GMMPrior):
        lt = self._gmm_logpdf_terms(x22, gmm)
        lse = jax.scipy.special.logsumexp(lt, axis=1)
        # reference adds +1e-12 inside the log (acinoset_misc.py:699-707)
        return -jnp.logaddexp(lse, jnp.log(1e-12))

    # -- joint limits --------------------------------------------------------
    def _limit_cost(self, q, frame_valid):
        G = jnp.asarray(self._G, q.dtype)
        lo = jnp.asarray(self._lo, q.dtype)
        hi = jnp.asarray(self._hi, q.dtype)
        v = jnp.einsum("cj,tj->tc", G, q)
        viol = jnp.maximum(v - hi[None], 0.0) + jnp.maximum(lo[None] - v, 0.0)
        return self.config.limit_penalty * jnp.sum(
            frame_valid[:, None] * viol * viol)

    # -- normal equations ----------------------------------------------------
    def _normal(self, q: jnp.ndarray, data: KinematicData,
                loss_scale: jnp.ndarray = 1.0
                ) -> Tuple[jnp.ndarray, banded.BlockBanded]:
        cfg = self.config
        N = q.shape[0]
        dtype = q.dtype
        s = jnp.asarray(loss_scale, q.dtype)
        w_all = self._meas_weights(data)

        # measurement normal terms with closed-form FK Jacobians: FK is
        # linear in the per-link rotations, so J = J_proj @ J_markers with
        # J_markers analytic (skeleton.fk_markers_and_jacobian) — ~10x
        # cheaper than 54-tangent jacfwd, and cheap enough to run the
        # quality-critical products at full f32 precision on TPU.
        proj = camera.project_fisheye if cfg.fisheye else \
            camera.project_pinhole

        shift_all = self._shutter_shift(data, N, q)

        def frame_terms(q_t, meas_t, w_t, shift_t):
            pts, Jm = sk.fk_markers_and_jacobian(q_t, self.subject)
            uv = self._project(pts, data.cam, shift_t)   # (C, 24, 2)
            Juv = jax.vmap(lambda K, D, R, t, sft: jax.vmap(
                jax.jacfwd(lambda p: proj(p, K, D, R, t)))(
                    pts + sft[None, :]))(
                data.cam.K, data.cam.D, data.cam.R,
                data.cam.t, shift_t)                     # (C, 24, 2, 3)
            res = uv[..., None] - meas_t                 # (C, 24, 2, W)
            w = jnp.broadcast_to(w_t, res.shape)
            if cfg.robust:
                loss_fn, params = self._meas_loss(s)
                gw, hw = losses.gauss_newton_weights(
                    res, w, loss_fn, cfg.curvature_floor,
                    loss_params=params)
            else:
                gw, hw = 2.0 * w * w * res, 2.0 * w * w \
                    * jnp.ones_like(res)
            J = jnp.einsum("cmdi,mik->cmdk", Juv, Jm)    # (C, 24, 2, 54)
            Jf = J.reshape(-1, NQ)                       # (C*24*2, 54)
            g_t = Jf.T @ jnp.sum(gw, axis=-1).reshape(-1)
            hsum = jnp.sum(hw, axis=-1).reshape(-1)      # (C*24*2,)
            H_t = (Jf * hsum[:, None]).T @ Jf
            # dC/dshift (per camera) for the live shutter chain rule
            dshift = jnp.einsum("cmdw,cmdi->ci", gw, Juv)
            # paw positions + Jacobian rows for the ground-plane anchor
            # (free: pts/Jm are already computed for the measurement term)
            paw_idx = jnp.asarray(_PAW_IDX)
            return g_t, H_t, dshift, pts[paw_idx], Jm[paw_idx]

        g_meas, H_meas, dshift, paw, Jpaw = jax.vmap(frame_terms)(
            q, data.meas, w_all, shift_all)

        # constant-acceleration banded quadratic (linear -> exact)
        H_acc = acc_banded(data.h, data.acc_weight, data.frame_valid)
        g_acc = banded.matvec(H_acc, q)

        Hdiag = H_acc.diag + H_meas
        g = g_acc + g_meas

        if cfg.live_shutter:
            # exact chain rule through shift = tau*vel(q) + tau^2*acc(q):
            # vel[t] = (qb[t]-qb[t-1])/h, acc[t] = 2nd difference / h^2, so
            # d shift[t,c] / d qb[t-j] has scalar coefficients below. The
            # curvature contribution is left to LM damping (the gradient is
            # what fixes the optimum).
            tau = data.sd_tau.astype(dtype)
            h = data.h
            mv = (jnp.arange(N) >= 1).astype(dtype)       # vel defined t>=1
            ma = (jnp.arange(N) >= 2).astype(dtype)       # acc defined t>=2
            a_v = tau / h                                  # d vel term
            a_a = (tau ** 2) / (h * h)                     # d acc term
            # contributions of frame t's shift onto qb[t], qb[t-1], qb[t-2]
            c0 = jnp.einsum("tci,c->ti", dshift, a_v) * mv[:, None] \
                + jnp.einsum("tci,c->ti", dshift, a_a) * ma[:, None]
            c1 = -jnp.einsum("tci,c->ti", dshift, a_v) * mv[:, None] \
                - 2.0 * jnp.einsum("tci,c->ti", dshift, a_a) * ma[:, None]
            c2 = jnp.einsum("tci,c->ti", dshift, a_a) * ma[:, None]
            g = g.at[:, :3].add(c0)
            g = g.at[:-1, :3].add(c1[1:])
            g = g.at[:-2, :3].add(c2[2:])

        if cfg.use_gmm:
            A22 = jnp.asarray(self._A22, dtype)
            x22 = jnp.einsum("ij,tj->ti", A22, q)
            lt = self._gmm_logpdf_terms(x22, data.gmm)
            lse = jax.scipy.special.logsumexp(lt, axis=1)
            gamma = jax.nn.softmax(lt, axis=1)            # (N, K)
            # d/dx of -log(p + eps) = p/(p+eps) * sum_k gamma_k Prec_k (x-mu_k)
            factor = jnp.exp(lse - jnp.logaddexp(lse, jnp.log(1e-12)))
            dx = x22[:, None, :] - data.gmm.means[None]
            gx = jnp.einsum("nk,kij,nkj->ni", gamma, data.gmm.prec, dx)
            gs = data.gmm_scale.astype(dtype)
            gx = gx * (gs * factor * data.frame_valid)[:, None]
            # EM/MM surrogate curvature: sum_k gamma_k Prec_k (PSD)
            Hx = jnp.einsum("nk,kij->nij",
                            gamma * (gs * factor
                                     * data.frame_valid)[:, None],
                            data.gmm.prec)
            g = g + jnp.einsum("ij,ti->tj", A22, gx)
            Hdiag = Hdiag + jnp.einsum("ia,tij,jb->tab", A22, Hx, A22)

        if cfg.use_ar:
            A28 = jnp.asarray(self._A28, dtype)
            x28 = jnp.einsum("ij,tj->ti", A28, q)
            r = x28 - data.ar.y_pred
            wv = data.ar.weight[None, :] * data.ar.valid[:, None]
            g = g + 2.0 * jnp.einsum("ij,ti->tj", A28, wv * r)
            HA = jnp.einsum("ia,ti,ib->tab", A28, wv, A28)
            Hdiag = Hdiag + 2.0 * HA

        # joint-limit hinge (active-set quadratic)
        G = jnp.asarray(self._G, dtype)
        lo = jnp.asarray(self._lo, dtype)
        hi = jnp.asarray(self._hi, dtype)
        v = jnp.einsum("cj,tj->tc", G, q)
        up_viol = jnp.maximum(v - hi[None], 0.0)
        lo_viol = jnp.maximum(lo[None] - v, 0.0)
        viol_grad = up_viol - lo_viol  # signed violation
        active = ((up_viol > 0) | (lo_viol > 0)).astype(dtype)
        mu = self.config.limit_penalty
        fv = data.frame_valid[:, None]
        g = g + 2.0 * mu * jnp.einsum("cj,tc->tj", G, fv * viol_grad)
        Hlim = jnp.einsum("ca,tc,cb->tab", G, fv * active * 2.0 * mu, G)
        Hdiag = Hdiag + Hlim

        if cfg.weld_weight > 0.0:
            # joint-manifold penalty: exact gradient + frame-local GN,
            # continuation-scaled like the cost (see cost_terms)
            rw = jax.vmap(lambda qt: sk.joint_residuals(qt))(q)
            Jw = jax.vmap(jax.jacfwd(
                lambda qt: sk.joint_residuals(qt)))(q)       # (N, 74, 54)
            ww = 2.0 * cfg.weld_weight * (1.0 / s)**4
            g = g + ww * fv * jnp.einsum("trj,tr->tj", Jw, rw)
            Hdiag = Hdiag + ww * fv[..., None] \
                * jnp.einsum("tri,trj->tij", Jw, Jw)

        if cfg.base_anchor_trans > 0.0 or cfg.base_anchor_rot > 0.0:
            # base-pose anchor: exact quadratic (diagonal blocks only)
            wb = jnp.asarray([cfg.base_anchor_trans] * 3
                             + [cfg.base_anchor_rot] * 3, dtype)
            rb = q[:, :6] - jnp.broadcast_to(
                data.base_ref.astype(dtype), (N, 6))
            g = g.at[:, :6].add(2.0 * fv * wb[None, :] * rb)
            Hb = jnp.zeros((NQ,), dtype).at[:6].set(2.0 * wb)
            Hdiag = Hdiag + fv[..., None] * jnp.diag(Hb)[None]

        lower = H_acc.lower
        if self._ground_on:
            fzp = paw[..., 2]                                 # (N, 4)
            Jz = Jpaw[:, :, 2, :]                             # (N, 4, 54)
            gzv = data.ground_z.astype(dtype)
            sw = jnp.broadcast_to(data.stance_w.astype(dtype),
                                  (N, 4)) * data.frame_valid[:, None]
            if cfg.ground_weight > 0.0:
                wg = cfg.ground_weight * sw
                rg = fzp - gzv
                g = g + 2.0 * jnp.einsum("tf,tfj->tj", wg * rg, Jz)
                Hdiag = Hdiag + 2.0 * jnp.einsum("tf,tfi,tfj->tij",
                                                 wg, Jz, Jz)
            if cfg.penetration_weight > 0.0:
                pen = jnp.maximum(gzv - fzp, 0.0)
                wp = cfg.penetration_weight * data.frame_valid[:, None]
                g = g - 2.0 * jnp.einsum("tf,tfj->tj", wp * pen, Jz)
                Hdiag = Hdiag + 2.0 * jnp.einsum(
                    "tf,tfi,tfj->tij", wp * (pen > 0).astype(dtype), Jz, Jz)
            if cfg.noslip_weight > 0.0:
                fxy = paw[..., :2]                            # (N, 4, 2)
                Jxy = Jpaw[:, :, :2, :]                       # (N, 4, 2, 54)
                dxy = fxy[1:] - fxy[:-1]                      # (N-1, 4, 2)
                wns = cfg.noslip_weight * sw[1:] * sw[:-1]    # (N-1, 4)
                g = g.at[1:].add(2.0 * jnp.einsum(
                    "tf,tfd,tfdj->tj", wns, dxy, Jxy[1:]))
                g = g.at[:-1].add(-2.0 * jnp.einsum(
                    "tf,tfd,tfdj->tj", wns, dxy, Jxy[:-1]))
                Hdiag = Hdiag.at[1:].add(2.0 * jnp.einsum(
                    "tf,tfdi,tfdj->tij", wns, Jxy[1:], Jxy[1:]))
                Hdiag = Hdiag.at[:-1].add(2.0 * jnp.einsum(
                    "tf,tfdi,tfdj->tij", wns, Jxy[:-1], Jxy[:-1]))
                # cross block H[t, t-1] = -2 w J_t^T J_{t-1}; banded layout
                # stores it at lower[0, t-1] (ops.banded.BlockBanded)
                cross = -2.0 * jnp.einsum(
                    "tf,tfdi,tfdj->tij", wns, Jxy[1:], Jxy[:-1])
                lower = lower.at[0, : N - 1].add(cross)

        # padded frames: identity anchor to keep H nonsingular
        pad = (1.0 - data.frame_valid)[:, None, None]
        Hdiag = Hdiag + (pad + self.config.tikhonov) * \
            jnp.eye(NQ, dtype=dtype)[None]

        H = banded.BlockBanded(diag=Hdiag, lower=lower)
        return g, H

    # -- joint shutter-delay solve (bordered system) ------------------------
    def _border_terms(self, q: jnp.ndarray, tau: jnp.ndarray,
                      data: KinematicData):
        """GN border blocks for the per-camera shutter delays as unknowns.

        Residual r = proj(pts + tau_c*vel + tau_c^2*acc) - meas, so
        dr/dtau_c = Juv @ (vel + 2 tau_c acc). Returns (gtau (C,),
        B (N, 54, C), Htt (C,)) accumulated over frames with the same
        robust-loss GN weights as the q-block."""
        cfg = self.config
        proj = camera.project_fisheye if cfg.fisheye else \
            camera.project_pinhole
        N = q.shape[0]
        w_all = self._meas_weights(data)
        vel, acc = self._base_derivatives(q, data.h)
        shift = (vel[:, None, :] * tau[None, :, None]
                 + acc[:, None, :] * (tau ** 2)[None, :, None])

        def frame(q_t, meas_t, w_t, shift_t, vel_t, acc_t):
            pts, Jm = sk.fk_markers_and_jacobian(q_t, self.subject)
            uv = self._project(pts, data.cam, shift_t)
            Juv = jax.vmap(lambda K, D, R, t, sft: jax.vmap(
                jax.jacfwd(lambda p: proj(p, K, D, R, t)))(
                    pts + sft[None, :]))(
                data.cam.K, data.cam.D, data.cam.R, data.cam.t, shift_t)
            res = uv[..., None] - meas_t
            w = jnp.broadcast_to(w_t, res.shape)
            if cfg.robust:
                loss_fn, params = self._meas_loss(1.0)
                gw, hw = losses.gauss_newton_weights(
                    res, w, loss_fn, cfg.curvature_floor,
                    loss_params=params)
            else:
                gw = 2.0 * w * w * res
                hw = 2.0 * w * w * jnp.ones_like(res)
            svec = vel_t[None, :] + 2.0 * tau[:, None] * acc_t[None, :]
            Jtau = jnp.einsum("cmdi,ci->cmd", Juv, svec)
            J = jnp.einsum("cmdi,mik->cmdk", Juv, Jm)
            hsum = jnp.sum(hw, axis=-1)                       # (C, 24, 2)
            gtau_t = jnp.einsum("cmdw,cmd->c", gw, Jtau)
            Htt_t = jnp.einsum("cmd,cmd,cmd->c", hsum, Jtau, Jtau)
            B_t = jnp.einsum("cmd,cmdk,cmd->kc", hsum, J, Jtau)
            return gtau_t, Htt_t, B_t

        gtau_f, Htt_f, B = jax.vmap(frame)(q, data.meas, w_all, shift,
                                           vel, acc)
        return jnp.sum(gtau_f, axis=0), B, jnp.sum(Htt_f, axis=0)

    def make_joint_shutter_solver(self, max_iters: int = 60,
                                  ftol: float = 1e-9, lam0: float = 1e-2,
                                  bound_weight: float = 1e8):
        """Jitted joint (q, tau) solve: per-camera shutter delays are solver
        unknowns coupled to the trajectory through the bordered banded system
        (replacing round 1's 41-point host grid scans). Camera 0 is pinned to
        tau = 0; |tau| <= h is enforced by a quadratic hinge (the reference
        bounds the pyomo Var to (-h, h), acinoset_misc.py:183). Config must
        have ``live_shutter=True`` so the q-gradient carries the exact
        chain rule through the shift."""
        from . import gn as gn_mod
        key = ("joint_shutter", max_iters, ftol, lam0, bound_weight)
        if key in self._solve_cache:
            return self._solve_cache[key]

        def run(q0: jnp.ndarray, tau0: jnp.ndarray, data: KinematicData
                ) -> gn_mod.BorderedState:
            h = data.h

            def cost_fn(q, tau):
                d2 = data._replace(sd_tau=tau)
                viol = jnp.maximum(jnp.abs(tau) - h, 0.0)
                return self._cost_impl(q, d2) \
                    + bound_weight * jnp.sum(viol * viol)

            def normal_fn(q, tau):
                d2 = data._replace(sd_tau=tau)
                g, H = self._normal(q, d2)
                gtau, B, Htt = self._border_terms(q, tau, d2)
                viol = jnp.maximum(jnp.abs(tau) - h, 0.0)
                gtau = gtau + 2.0 * bound_weight * viol * jnp.sign(tau)
                Htt = Htt + 2.0 * bound_weight * (viol > 0).astype(tau.dtype)
                # pin camera 0 (reference convention: delays are relative)
                Htt = Htt.at[0].add(1e12)
                return g, H, gtau, B, Htt

            with jax.default_matmul_precision("highest"):
                return gn_mod.lm_solve_bordered(
                    cost_fn, normal_fn, q0, tau0,
                    gn_mod.LMConfig(max_iters=max_iters, ftol=ftol,
                                    lam0=lam0))

        run_jit = jax.jit(run)
        self._solve_cache[key] = run_jit
        return run_jit

    # -- annealed solve ------------------------------------------------------
    def make_solver(self,
                    stages: Tuple[Tuple[float, int], ...] = (
                        (10.0, 30), (3.0, 30), (1.0, 150)),
                    ftol: float = 1e-9, lam0: float = 1e-2,
                    linear_solver: str = "cr", driver: str = "while"):
        """Jitted graduated-non-convexity solve: anneal the redescending loss
        thresholds (scale s: wide -> 1) so early iterations see gradient
        everywhere, then tighten to the reference's exact (3, 10, 20) loss.

        Returns run(q0, data) -> LMState. vmap over a leading batch dim works
        (jax.vmap(run)).
        """
        from . import gn as gn_mod
        key = (stages, ftol, lam0, linear_solver, driver)
        if key in self._solve_cache:
            return self._solve_cache[key]

        if not self.config.robust:
            stages_eff = ((1.0, sum(it for _, it in stages)),)
        else:
            stages_eff = stages

        def run(q0: jnp.ndarray, data: KinematicData) -> gn_mod.LMState:
            # full f32 matmul precision throughout: on TPU the default bf16
            # passes corrupt the 1e7-scale motion-prior gradients, the
            # joint-limit active sets and the accept/reject cost, tripling
            # iteration counts and degrading the optimum. The matrices here
            # are small, so the cost of full precision is modest.
            with jax.default_matmul_precision("highest"):
                cost_fn = lambda q, s: self._cost_impl(q, data, s)
                normal_fn = lambda q, s: self._normal(q, data, s)
                if driver == "fixed" and len(stages_eff) == 1:
                    # single-stage fixed-length scan: the annealed drivers
                    # compile the cost body TWICE (stage-boundary re-eval +
                    # the LM step's trial evaluation); with one stage there
                    # are no boundaries, so the plain scan driver halves
                    # the compiled body (the multistart PROBE path — cold
                    # compile is the cost that matters there)
                    sc, iters = stages_eff[0]
                    s_tr = jnp.asarray(sc, q0.dtype)
                    final, _ = gn_mod.lm_solve_scan(
                        lambda q: cost_fn(q, s_tr),
                        lambda q: normal_fn(q, s_tr), q0,
                        gn_mod.LMConfig(max_iters=iters, ftol=ftol,
                                        lam0=lam0,
                                        linear_solver=linear_solver))
                    return final
                solver = (gn_mod.lm_solve_annealed_scan if driver == "scan"
                          else gn_mod.lm_solve_annealed)
                return solver(
                    cost_fn, normal_fn, q0, stages_eff,
                    gn_mod.LMConfig(ftol=ftol, lam0=lam0,
                                    linear_solver=linear_solver))

        run_jit = jax.jit(run)
        self._solve_cache[key] = run_jit
        return run_jit
