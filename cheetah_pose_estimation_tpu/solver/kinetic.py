"""Physics-based FTE: trajectory estimation under full rigid-body dynamics.

TPU-native counterpart of the reference ``estimate_kinetics``
(``acinoset_opt.py:693-963``): the objective

  cost = 1e-3 * ( measurement + [GMM pose] +
                  (torque^2 + 0.1 fps^-2 * marker-acceleration energy) +
                  1e4 * EOM-slack^2 )

with joint torques and (during prescribed stances) ground reaction forces as
unknowns, no-slip and foot-height stance constraints as hinge penalties, and
the implicit-Euler collocation eliminated exactly (dq/ddq = finite
differences of q, so the EOM residual at frame t couples q[t-2..t] and the
normal matrix stays inside the bandwidth-3 banded structure).

Key structural moves (vs. handing a 100k-variable NLP to IPOPT):

* per-frame torque/GRF elimination — for fixed q the inner minimization over
  (tau, grf) is a small regularized least-squares problem solved in closed
  form inside the jitted residual; by the envelope theorem the outer gradient
  in q is then exact while the eliminated variables track their optimum;
* generalized-Gauss-Newton curvature for the EOM term keeps only the
  dominant (1/h^2-scaled) dependence, H_eom ~ stencil (x) M^T W M, with the
  exact gradient supplied by reverse-mode autodiff — LM damping covers the
  truncation.

GRF non-negativity and the friction polyhedron (mu GRFz >= sum GRFxy,
reference Foot3D with mu = 0.8 when the LCP is disabled,
``acinoset_opt.py:501-506``) are enforced by projection after the linear
solve plus the EOM slack absorbing the residual.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics import eom as dyn
from ..models import skeleton as sk
from ..models.params import SubjectParams
from ..ops import banded, losses
from . import kinematic as kin

NQ = 54
N_Z = dyn.N_TAU + dyn.N_FEET + dyn.N_FEET * dyn.N_POLYGON  # 22 + 4 + 16


class KineticData(NamedTuple):
    """Per-trial arrays for the physics-based problem."""
    base: kin.KinematicData
    stance: jnp.ndarray        # (N, 4) 1.0 while a foot is in stance
    grf_fixed: jnp.ndarray     # (N, 4) fixed GRFz profile (body weights);
    grf_xy_fixed: jnp.ndarray  # (N, 4, 4) fixed polygon components
    use_fixed_grf: jnp.ndarray  # scalar 1.0 -> use fixed profiles
    q_warm: jnp.ndarray        # (N, 54) kinematic warm start (tracking)
    # optional torque anchor (GRF re-estimation mode, acinoset_opt.py:995-1001
    # bounds torques within 10% of the prior kinetic solution — realized here
    # as a quadratic anchor in the per-frame elimination)
    # numpy defaults (jnp would initialize the backend at import time)
    tau_anchor: jnp.ndarray = np.zeros((1, dyn.N_TAU))    # (N, 22) or (1, 22)
    tau_anchor_weight: jnp.ndarray = np.asarray(0.0)
    # ground plane elevation (m): the reference reads it from metadata.json
    # and sets Foot3D.ground_plane_height (acinoset_opt.py:464-472,500) — the
    # AcinoSet world frames do NOT have the ground at z=0 (2017 trials sit
    # near +0.1, 2019 near -0.1), so anchoring stance feet to z=0 drags the
    # whole reconstruction off by the offset
    ground_z: jnp.ndarray = np.asarray(0.0)


@dataclasses.dataclass(frozen=True)
class KineticConfig:
    fisheye: bool = True
    robust: bool = True
    # measurement loss shape: "huber" keeps a restoring gradient at any
    # distance from the data (see ops.losses.huber and KinematicConfig.loss)
    meas_loss: str = "huber"
    # filter-style acceptance guard (IPOPT filter line-search analog): a
    # trial step whose measurement+prior cost exceeds meas_guard x the warm
    # start's is rejected even if the total cost dropped — the EOM term
    # dominates the objective, and without the guard a dynamics-feasible
    # trajectory that ignores the data can cost less than the true one.
    # 0 disables.
    meas_guard: float = 2.0
    use_gmm: bool = False
    kinetic_dataset: bool = False
    limit_penalty: float = 1e5
    tikhonov: float = 1e-2
    curvature_floor: float = 1e-3
    eom_weight: float = 1e4          # 10e3 in reference units
    # epsilon-insensitive EOM slack (body-weight units): |slack| below this
    # is free. The reference bounds slack to +-2 BW (run_dataset.py:1208
    # bound_eom_error) — "violations at this scale are acceptable" — and our
    # closed-form engine shows a ~0.1-0.15 BW RMS residual floor *at the
    # reference's own dynamically consistent solutions* (discretization +
    # model mismatch). Without the deadband the 1e4 weight makes the solver
    # chase residuals below that floor, trading reconstruction accuracy for
    # pseudo-physics (measured: oracle-stance solves *degrade* their warm
    # start MPJPE when eom_deadband=0).
    eom_deadband: float = 2.0
    # with eom_floor_relative, the deadband is per-coordinate:
    # eom_deadband * EOM_SLACK_FLOOR[i] (models/noise.py) — tight on the
    # limb equations (floor ~0.01-0.13 BW, where the reference's physics
    # mode earns its MPJPE win) and forgiving only on the base translation
    # bookkeeping (floor 0.34-0.53 BW)
    eom_floor_relative: bool = True
    # absolute deadband override (BW) for the THREE base-translation EOM
    # rows (m a_com = sum GRF + m g — the CoM-dynamics equations). The
    # EOM_SLACK_FLOOR for these rows (0.34-0.53 BW) was measured at the
    # reference's solutions via double finite differencing, which amplifies
    # mm-level solution jitter to ~0.4 BW of apparent force — it is a
    # property of the scoring, not of the engine. Leaving the full 2x floor
    # band open lets monocular depth wobble (~1 BW of low-frequency
    # apparent base acceleration) ride inside it untouched, which is why
    # round-2 physics left CoM velocity exactly at its warm start. A tight
    # absolute band here makes the physics stage own the CoM-dynamics
    # metric (the reference's 0.70 -> 0.50 CoM-vel win, BASELINE.md).
    # None = use the relative floor for the base rows too.
    # 0.0 (chase the base EOM exactly) is the measured optimum of the
    # round-4 response-surface sweep (docs/artifacts/deadband_sweep.csv):
    # CoM-velocity RMSE improves 3.8% over the warm start at unchanged MPE,
    # vs 0.6-1.8% for every non-zero band — the 0.34-0.53 BW "floor" on
    # these rows was an artifact of double-finite-difference scoring, not a
    # reason to leave the solve slack.
    base_deadband: Optional[float] = 0.0
    # keep the kinematic constant-acceleration motion model active in the
    # physics stage. The reference's quadratic slack penalty doubles as a
    # high-frequency damper (any jitter needs torque or slack, both paid
    # for); an epsilon-insensitive slack loses that damping, so the q-space
    # acc model supplies it instead (measured: without it, deadbanded solves
    # develop marker-acceleration energy 30-60x the ground truth's).
    keep_acc_model: bool = False
    torque_weight: float = 1.0
    smooth_weight_scale: float = 0.1  # x fps^-2 on marker acceleration
    no_slip_penalty: float = 1e3
    foot_height_penalty: float = 1e4
    foot_height_bound: float = 0.1   # 0.03 kinetic dataset
    friction_coeff: float = 0.8
    # joint-structure weld penalty (reference revolute/Hooke joints,
    # cheetah.py:71-73,101,160-161): pins the 26 marker-unobservable
    # relative roll/yaw coordinates the reference's dynamics model does not
    # even have. Exact quadratic (curvature model error = 0), so LM treats
    # it as a hard manifold.
    weld_weight: float = 1e6
    # GRF component bounds in body-weight units (reference Foot3D pyomo vars
    # GRFz/GRFxy bounds=(0, 5.0), acinoset_opt.py:185-186). Without the cap
    # the eliminated contact force is an unbounded fictitious-force channel:
    # monocular depth wobble (~10+ BW of apparent base acceleration during
    # stance) gets absorbed at the 1e-3 ridge's negligible cost instead of
    # being corrected, and the physics stage leaves CoM velocity untouched.
    grf_max: float = 5.0
    # prescribed-stance GRFz floor in body-weight units (reference
    # prescribe_contact_order min_GRFz, acinoset_misc.py:1143): a foot in a
    # prescribed stance window must carry at least this much load
    min_grf_z: float = 0.01
    # epsilon-relaxed linear complementarity GRFz * foot_height <= eps
    # (reference Foot3D.enable_lcp(bool, eps), acinoset_opt.py:505 — the
    # engine capability the estimator optionally re-enables)
    enable_lcp: bool = False
    lcp_eps: float = 1e-3
    lcp_penalty: float = 1e5
    cam_multipliers: Tuple[float, ...] = ()
    # reference estimate_kinetics(use_2d_reprojections=False): replace the
    # reprojection term with a weighted 3D tracking cost against the
    # kinematic warm start (kinematic_cost, acinoset_misc.py:531-598)
    use_2d_reprojections: bool = True
    # frame-chunk size for the one-shot EOM curvature assembly
    # (eom_curvature_blocks): the per-frame jacfwd of (M, bias, force
    # columns) materializes ~54-tangent FK intermediates, and a full
    # vmap over B x N frames exceeds the 16 GB v5e HBM at B=10 x N=64.
    # lax.map(batch_size=chunk) sequences the assembly in frame chunks —
    # peak memory drops by N/chunk while the (off-hot-loop, run-once)
    # assembly stays vectorized within a chunk. 0 = unchunked vmap.
    curv_chunk: int = 8


class KineticFTE:
    """Jitted cost/normal for the physics-based FTE."""

    def __init__(self, config: KineticConfig, subject: SubjectParams):
        self.config = config
        self.subject = subject
        kcfg = kin.KinematicConfig(
            fisheye=config.fisheye, robust=config.robust,
            loss=config.meas_loss,
            use_gmm=config.use_gmm, kinetic_dataset=config.kinetic_dataset,
            limit_penalty=config.limit_penalty, tikhonov=config.tikhonov,
            curvature_floor=config.curvature_floor,
            cam_multipliers=config.cam_multipliers,
            # the kinetic stage carries its own weld term (_weld_cost);
            # the inner kinematic config must not add a second copy
            weld_weight=0.0)
        self._kin = kin.KinematicFTE(kcfg, subject)
        self.force_scale = subject.total_mass * dyn.GRAVITY
        self.cost = jax.jit(self._cost)
        self.normal = jax.jit(self._normal)
        self._solve_cache = {}

    def _deadband(self, dtype) -> Optional[jnp.ndarray]:
        """Per-coordinate (54,) or scalar epsilon-insensitive slack band,
        None when disabled."""
        cfg = self.config
        if cfg.eom_deadband <= 0.0:
            return None
        if cfg.eom_floor_relative:
            from ..models import noise as noise_tables
            db = cfg.eom_deadband * np.asarray(noise_tables.EOM_SLACK_FLOOR)
            if cfg.base_deadband is not None:
                db = np.concatenate([np.full(3, cfg.base_deadband), db[3:]])
            return jnp.asarray(db, dtype)
        return jnp.asarray(cfg.eom_deadband, dtype)

    # ------------------------------------------------------------------
    # kinematic derivatives of the q-trajectory (implicit Euler, eliminated)
    # ------------------------------------------------------------------
    @staticmethod
    def _derivatives(q: jnp.ndarray, h: jnp.ndarray):
        dq = jnp.zeros_like(q).at[1:].set((q[1:] - q[:-1]) / h)
        ddq = jnp.zeros_like(q).at[2:].set((dq[2:] - dq[1:-1]) / h)
        return dq, ddq

    # ------------------------------------------------------------------
    # per-frame torque/GRF elimination
    # ------------------------------------------------------------------
    def _force_columns(self, q_t: jnp.ndarray) -> jnp.ndarray:
        """(54, 20) generalized-force columns of [GRFz(4); GRFxy(16)] in
        body-weight units: J_foot^T e_z per foot and J_foot^T D_i per
        polygon direction, with the closed-form foot-point Jacobian (feet
        are linear in the rotations like every other attachment point)."""
        dtype = q_t.dtype
        C_all = jnp.asarray(sk.bottom_coefficients(self.subject), dtype)
        idx = [sk.LINK_INDEX[n] for n in dyn.FEET_LINKS]
        _, Jf = sk.points_and_jacobian_from_coeffs(q_t, C_all[:, idx, :])
        # cols for GRFz: J_f^T e_z ; for GRFxy: J_f^T D_i  (unit force in
        # body-weight units after the scale cancellation)
        ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
        cols_z = jnp.einsum("fik,i->kf", Jf, ez)              # (54, 4)
        D = jnp.asarray(dyn.POLYGON_D, dtype)                 # (4dir, 3)
        cols_xy = jnp.einsum("fik,di->kfd", Jf, D).reshape(NQ, 16)
        return jnp.concatenate([cols_z, cols_xy], axis=1)

    def _frame_system(self, q3: jnp.ndarray, data: KineticData,
                      stance_t, grf_z_fix, grf_xy_fix):
        """Shared per-frame elimination system for (q[t-2], q[t-1], q[t]).

        Returns (M, lhs_eff, A, Cg, gmask, sc, L) with L the Cholesky factor
        of the Jacobi-equilibrated reduced normal matrix
        ``we A^T A + diag(wreg)``.
        """
        cfg = self.config
        h = data.base.h
        dtype = q3.dtype
        q_t = q3[2]
        dq_t = (q3[2] - q3[1]) / h
        ddq_t = (q3[2] - 2 * q3[1] + q3[0]) / h**2
        M = dyn.mass_matrix(q_t, self.subject)
        lhs = (M @ ddq_t + dyn.bias_terms(q_t, dq_t, self.subject)) \
            / self.force_scale                                  # (54,)
        Btau = jnp.asarray(dyn.TORQUE_MAP.B, dtype)             # (54, 22)
        Cg = self._force_columns(q_t)                           # (54, 20)
        # active GRF columns: stance feet only (flight forces fixed at 0)
        gmask_z = stance_t                                      # (4,)
        gmask_xy = jnp.repeat(stance_t, 4)                      # (16,)
        gmask = jnp.concatenate([gmask_z, gmask_xy])
        use_free_grf = (1.0 - data.use_fixed_grf)
        Cg_act = Cg * (gmask * use_free_grf)[None, :]
        A = jnp.concatenate([Btau, Cg_act], axis=1)             # (54, 42)
        # fixed-GRF contribution moves to the left-hand side
        zfix = jnp.concatenate([grf_z_fix, grf_xy_fix.reshape(16)])
        lhs_eff = lhs - data.use_fixed_grf * (Cg @ (zfix * gmask))
        we = cfg.eom_weight
        wa = data.tau_anchor_weight
        wreg = jnp.concatenate([
            jnp.full((dyn.N_TAU,), cfg.torque_weight, dtype) + wa,
            jnp.full((20,), 1e-3, dtype)])  # tiny ridge on free GRF
        # minimize we|lhs_eff - A z|^2 + z^T diag(wreg) z + wa|tau - anchor|^2
        AtA = we * (A.T @ A) + jnp.diag(wreg)
        # SPD system: Cholesky (the axon TPU backend lacks f64 LU), with
        # symmetric Jacobi equilibration — raw diagonals span we*|A_col|^2
        # (~1e5) down to the 1e-3 GRF ridge of masked columns, which breaks
        # float32 factorization. The equilibrated matrix additionally gets a
        # dtype-scaled identity bump: the four friction-polygon directions
        # span only the 2-D tangent plane, so the GRFxy block is exactly
        # rank-deficient and the physical 1e-3 ridge sits ~1e-8 below the
        # we-scale diagonal — under float32 eps, where roundoff makes the
        # factorization fail on stance frames.
        sc = jax.lax.rsqrt(jnp.diagonal(AtA))
        bump = 128.0 * jnp.finfo(dtype).eps
        As = AtA * sc[:, None] * sc[None, :] \
            + bump * jnp.eye(AtA.shape[0], dtype=dtype)
        L = jnp.linalg.cholesky(As)
        return M, lhs_eff, A, Cg, gmask, sc, L

    def _frame_solve(self, q3: jnp.ndarray, data: KineticData,
                     stance_t, grf_z_fix, grf_xy_fix, tau_anchor_t=None):
        """Per-frame elimination with a one-step active-set refinement.

        Pass 1 solves the unconstrained reduced system and projects the GRF
        onto its box/friction constraints (clip to [min_grf_z, grf_max],
        [0, grf_max], cone scaling). Pass 2 fixes the projected components
        at their bounds and RE-SOLVES the remaining free (tau, grf)
        subsystem. The re-solve is what restores first-order optimality of
        the eliminated variables: a merely clip-projected point is not a
        KKT point of the box-constrained QP, so the envelope theorem fails
        there and the outer autodiff gradient picks up large spurious
        components through dz/dq (the round-2 measured symptom: EOM
        gradients ~1e7 in link-rotation coordinates at loaded stance frames
        against modeled curvature ~1e3 — LM thrash, no descent on gross
        dynamics violations).

        Returns (slack (54,), tau (22,), gz_out (4,), gxy_out (4,4),
        aux = (A_act, sc2, L2, g_all)) with the pass-2 masked factorization
        for the curvature projector and g_all the total applied force
        components (free + bound-fixed + externally-fixed).
        """
        cfg = self.config
        dtype = q3.dtype
        M, lhs_eff, A, Cg, gmask, sc, L = self._frame_system(
            q3, data, stance_t, grf_z_fix, grf_xy_fix)
        gmask_z = stance_t
        use_free_grf = (1.0 - data.use_fixed_grf)
        we = cfg.eom_weight
        wa = data.tau_anchor_weight
        rhs = we * (A.T @ lhs_eff)
        if tau_anchor_t is not None:
            rhs = rhs.at[:dyn.N_TAU].add(wa * tau_anchor_t)
        z0 = sc * jax.scipy.linalg.cho_solve((L, True), sc * rhs)
        g0z = z0[dyn.N_TAU:dyn.N_TAU + 4]
        g0xy = z0[dyn.N_TAU + 4:].reshape(4, 4)
        # pass-1 projection: box + friction polyhedron
        gz_c = jnp.clip(g0z, cfg.min_grf_z, cfg.grf_max) \
            * gmask_z * use_free_grf
        gxy_c = jnp.clip(g0xy, 0.0, cfg.grf_max) \
            * stance_t[:, None] * use_free_grf
        cone = cfg.friction_coeff * gz_c / jnp.maximum(gxy_c.sum(axis=1),
                                                       1e-9)
        cs = jnp.minimum(cone, 1.0)
        gxy_c = gxy_c * cs[:, None]
        # free set: strictly-inside components of cone-feasible feet
        cone_free = cs >= 1.0 - 1e-6                          # (4,)
        free_z = ((g0z > cfg.min_grf_z) & (g0z < cfg.grf_max)
                  & cone_free).astype(dtype) * gmask_z * use_free_grf
        free_xy = ((g0xy > 0.0) & (g0xy < cfg.grf_max)
                   & cone_free[:, None]).astype(dtype) \
            * stance_t[:, None] * use_free_grf
        free = jnp.concatenate([free_z, free_xy.reshape(16)])  # (20,)
        g_fix = (1.0 - free) * jnp.concatenate([gz_c, gxy_c.reshape(16)])
        col_act = jnp.concatenate([jnp.ones((dyn.N_TAU,), dtype), free])
        A_act = A * col_act[None, :]
        lhs2 = lhs_eff - Cg @ g_fix
        wreg = jnp.concatenate([
            jnp.full((dyn.N_TAU,), cfg.torque_weight, dtype) + wa,
            jnp.full((20,), 1e-3, dtype)])
        AtA2 = we * (A_act.T @ A_act) + jnp.diag(wreg)
        sc2 = jax.lax.rsqrt(jnp.diagonal(AtA2))
        bump = 128.0 * jnp.finfo(dtype).eps
        As2 = AtA2 * sc2[:, None] * sc2[None, :] \
            + bump * jnp.eye(AtA2.shape[0], dtype=dtype)
        L2 = jnp.linalg.cholesky(As2)
        rhs2 = we * (A_act.T @ lhs2)
        if tau_anchor_t is not None:
            rhs2 = rhs2.at[:dyn.N_TAU].add(wa * tau_anchor_t)
        z2 = sc2 * jax.scipy.linalg.cho_solve((L2, True), sc2 * rhs2)
        tau = z2[:dyn.N_TAU]
        g2 = z2[dyn.N_TAU:] * free
        # safety clip (a re-solved free component can exit its box; the
        # residual envelope error is then second-order, not first-order)
        g2 = jnp.concatenate([
            jnp.clip(g2[:4], 0.0, cfg.grf_max),
            jnp.clip(g2[4:], 0.0, cfg.grf_max)]) * free
        g_tot = g2 + g_fix
        slack = lhs_eff - A @ jnp.concatenate([tau, g_tot])
        gz_out = data.use_fixed_grf * grf_z_fix * gmask_z + g_tot[:4]
        gxy_out = data.use_fixed_grf * grf_xy_fix * stance_t[:, None] \
            + g_tot[4:].reshape(4, 4)
        zfix_ext = jnp.concatenate([grf_z_fix, grf_xy_fix.reshape(16)])
        g_all = g_tot + data.use_fixed_grf * zfix_ext * gmask
        return slack, tau, gz_out, gxy_out, (A_act, sc2, L2, g_all)

    def _frame_eom_terms(self, q3: jnp.ndarray, data: KineticData,
                         stance_t, grf_z_fix, grf_xy_fix,
                         tau_anchor_t=None):
        """EOM slack for one frame given (q[t-2], q[t-1], q[t]) stacked (3,54).

        Returns (slack (54,), tau (22,), grf_z (4,), grf_xy (4,4)).
        """
        slack, tau, gz_out, gxy_out, _ = self._frame_solve(
            q3, data, stance_t, grf_z_fix, grf_xy_fix, tau_anchor_t)
        return slack, tau, gz_out, gxy_out

    def _frame_projector(self, q3: jnp.ndarray, data: KineticData,
                         stance_t, grf_z_fix, grf_xy_fix) -> jnp.ndarray:
        """Symmetric PSD residual projector P = I - we A K A^T of the
        per-frame (tau, grf) elimination: the effective EOM residual is
        sqrt(we) P (lhs(q) - const), so P is the left factor of every GN
        curvature kernel (K the inverse reduced normal matrix). Round-1 bug
        history: using the full M^T M instead said the EOM resists motion in
        *actuated* directions it does not actually resist — overestimating
        curvature by ~we/ridge in ~34/54 directions and freezing the
        optimizer on its warm start.

        The projector also honors the GRF bound projection: a force
        component clipped at its bound (0 / min_grf_z / grf_max) is NOT a
        free elimination direction, so its column leaves A before P is
        formed. Otherwise the curvature says base motion is force-absorbable
        while the exact gradient pushes with the full clipped residual —
        a gradient/curvature inconsistency under which LM thrashes
        (measured: a 15 mm measurement-invisible depth wobble, ~50 BW of
        base EOM violation, was *not* descended and the pose was destroyed
        instead). The active set and masked factorization come from the
        pass-2 solve (_frame_solve), so projector and eliminated forces are
        consistent by construction."""
        we = self.config.eom_weight
        _, _, _, _, (A_act, sc2, L2, _) = self._frame_solve(
            q3, data, stance_t, grf_z_fix, grf_xy_fix)
        Asc = A_act * sc2[None, :]
        X = jax.scipy.linalg.cho_solve((L2, True), Asc.T)     # (42, 54)
        return jnp.eye(NQ, dtype=q3.dtype) - we * (Asc @ X)

    def _frame_curv_channels(self, q3: jnp.ndarray, data: KineticData,
                             stance_t, grf_z_fix, grf_xy_fix) -> jnp.ndarray:
        """(3, 54, 54) projected EOM residual Jacobians P @ dF/dq_{t-a}.

        F(q3) = (M(q_t) ddq + bias(q_t, dq_t)) / fs with implicit-Euler
        dq/ddq stencils. ALL THREE channels are kept:
          * the 1/h^2 mass channel (M x ddq stencil),
          * the 1/h velocity channel dbias/ddq (Coriolis/centrifugal +
            passive drag/damping),
          * the direct channel d(M ddq + bias)/dq_t (gravity, configuration
            dependence).
        Round-2 measured failures when channels are dropped: without the
        velocity channel, directions like a linear base drift have zero
        ddq-stencil curvature but a large exact gradient through Coriolis
        terms; without the force-column channel, link rotations at loaded
        stance frames carry gradients ~1e7 (we * slack * dJ_foot/dtheta * z,
        z up to grf_max) against diagonal curvature ~1e3. Either way the
        damped normal step explodes along the uncovered direction
        (|dq| ~ 2-4e3) and LM thrashes instead of descending a 50 BW EOM
        violation."""
        cfg = self.config
        h = data.base.h
        q_t = q3[2]
        dq_t = (q3[2] - q3[1]) / h
        ddq_t = (q3[2] - 2 * q3[1] + q3[0]) / h**2
        M = dyn.mass_matrix(q_t, self.subject)
        Cd = jax.jacfwd(
            lambda dd: dyn.bias_terms(q_t, dd, self.subject))(dq_t)
        D1 = jax.jacfwd(
            lambda qq: dyn.mass_matrix(qq, self.subject) @ ddq_t
            + dyn.bias_terms(qq, dq_t, self.subject))(q_t)
        # force-column channel: slack = lhs - Btau tau - Cg(q) g_all with
        # (tau, g_all) frozen at their eliminated optimum (GN). Btau is
        # constant; Cg rotates with the links.
        we = self.config.eom_weight
        _, _, _, _, (A_act, sc2, L2, g_all) = self._frame_solve(
            q3, data, stance_t, grf_z_fix, grf_xy_fix)
        D2 = jax.jacfwd(
            lambda qq: self._force_columns(qq) @ g_all)(q_t)
        fs = self.force_scale
        J0 = (M / h**2 + Cd / h + D1) / fs - D2     # d/dq_t
        J1 = (-2.0 * M / h**2 - Cd / h) / fs        # d/dq_{t-1}
        J2 = (M / h**2) / fs                        # d/dq_{t-2}
        Asc = A_act * sc2[None, :]
        X = jax.scipy.linalg.cho_solve((L2, True), Asc.T)
        P = jnp.eye(NQ, dtype=q3.dtype) - we * (Asc @ X)
        return jnp.stack([P @ J0, P @ J1, P @ J2])

    def _q3_stack(self, q: jnp.ndarray) -> jnp.ndarray:
        """(N, 3, 54): frames (t-2, t-1, t) with edge replication."""
        qm1 = jnp.concatenate([q[:1], q[:-1]], axis=0)
        qm2 = jnp.concatenate([q[:1], q[:1], q[:-2]], axis=0)
        return jnp.stack([qm2, qm1, q], axis=1)

    def _eom_valid(self, data: KineticData) -> jnp.ndarray:
        fv = data.base.frame_valid
        N = fv.shape[0]
        v = jnp.zeros(N, fv.dtype)
        if N > 2:
            v = v.at[2:].set(fv[2:] * fv[1:-1] * fv[:-2])
        return v

    # ------------------------------------------------------------------
    # cost terms
    # ------------------------------------------------------------------
    @staticmethod
    def _eom_ramp(loss_scale) -> jnp.ndarray:
        """Penalty-continuation ramp on the EOM slack weight, tied to the
        robust-loss annealing scale: weight_eff = eom_weight / s^4 (s = 3
        -> 1/81, s = 1 -> full). The reference enforces collocation as hard
        constraints inside an interior-point method, whose barrier
        continuation tightens feasibility gradually; a one-shot quadratic
        penalty at full weight instead lets a grossly violated warm start's
        ~1e8-scale EOM pull overwhelm the bounded-influence robust
        measurement term, and the solve runs away from the data (round-2
        measured: MPE 0.66 m with the EOM 'improved'). Ramping restores the
        order: gross, measurement-invisible violations get fixed at low
        weight while the measurements still hold the pose, then each
        tightening starts near-feasible."""
        return (1.0 / loss_scale) ** 4

    def _physics_costs(self, q: jnp.ndarray, data: KineticData,
                       loss_scale=1.0):
        cfg = self.config
        h = data.base.h
        q3 = self._q3_stack(q)
        valid = self._eom_valid(data)
        anchor = jnp.broadcast_to(data.tau_anchor,
                                  (q.shape[0], dyn.N_TAU))
        slack, tau, gz, gxy = jax.vmap(
            lambda q3t, st, gf, gxf, an: self._frame_eom_terms(
                q3t, data, st, gf, gxf, an))(
            q3, data.stance, data.grf_fixed, data.grf_xy_fixed, anchor)
        db = self._deadband(q.dtype)
        if db is not None:
            sl = jnp.maximum(jnp.abs(slack) - db, 0.0)
        else:
            sl = slack
        eom_cost = self._eom_ramp(loss_scale) * cfg.eom_weight * jnp.sum(
            valid[:, None] * sl * sl)
        torque_cost = cfg.torque_weight * jnp.sum(
            valid[:, None] * tau * tau)
        anchor_cost = data.tau_anchor_weight * jnp.sum(
            valid[:, None] * (tau - anchor)**2)
        if cfg.enable_lcp:
            # epsilon-relaxed complementarity: a loaded foot must touch the
            # ground (GRFz * foot_height <= eps), gradient flowing through
            # both the eliminated force and the foot kinematics
            pts = jax.vmap(
                lambda qq: dyn.foot_points(qq, self.subject))(q)
            hpos = jnp.maximum(pts[..., 2] - data.ground_z, 0.0)
            viol = jnp.maximum(gz * hpos - cfg.lcp_eps, 0.0)
            torque_cost = torque_cost + cfg.lcp_penalty * jnp.sum(
                data.base.frame_valid[:, None] * viol * viol)
        return eom_cost, torque_cost + anchor_cost, (slack, tau, gz, gxy)

    def _smooth_cost(self, q: jnp.ndarray, data: KineticData) -> jnp.ndarray:
        """Marker-position second-difference energy (reference
        ``motion_smoothing_cost``, acinoset_misc.py:601-613), weighted
        0.1 fps^-2 inside the motion prior (acinoset_opt.py:919-920)."""
        cfg = self.config
        fps = 1.0 / data.base.h
        pts = jax.vmap(lambda qq: sk.fk_markers(qq, self.subject))(q)
        if q.shape[0] < 3:
            return jnp.zeros((), q.dtype)
        acc = fps**2 * (pts[2:] - 2 * pts[1:-1] + pts[:-2])
        fv = data.base.frame_valid
        v = fv[2:] * fv[1:-1] * fv[:-2]
        energy = jnp.sum(v[:, None, None] * acc * acc)
        return cfg.smooth_weight_scale * (data.base.h**2) * energy

    def _stance_penalties(self, q: jnp.ndarray,
                          data: KineticData) -> jnp.ndarray:
        """No-slip (foot xy speed <= 1 m/s) and stance foot-height box
        penalties (reference acinoset_opt.py:803-812 +
        prescribe_contact_order)."""
        cfg = self.config
        h = data.base.h
        pts = jax.vmap(lambda qq: dyn.foot_points(qq, self.subject))(q)
        fv = data.base.frame_valid
        heights = pts[..., 2] - data.ground_z                   # (N, 4)
        hb = cfg.foot_height_bound
        hviol = jnp.maximum(jnp.abs(heights) - hb, 0.0)
        height_pen = cfg.foot_height_penalty * jnp.sum(
            (fv[:, None] * data.stance) * hviol * hviol)
        vel_xy = (pts[1:, :, :2] - pts[:-1, :, :2]) / h
        # hinge on the *speed* (not speed^2): the quartic (v^2-1)^2 form
        # explodes to ~1e9 on monocular warm starts whose depth wobble makes
        # feet apparently move at 10 m/s, and its steepness then owns the
        # whole solve; the quadratic speed hinge matches the reference's
        # hard bound gamma <= 1 (acinoset_opt.py:803-809) with sane scaling
        speed = jnp.sqrt(jnp.sum(vel_xy * vel_xy, axis=-1) + 1e-12)
        sviol = jnp.maximum(speed - 1.0, 0.0)
        slip_pen = cfg.no_slip_penalty * jnp.sum(
            (fv[1:, None] * data.stance[1:]) * sviol * sviol)
        return height_pen + slip_pen

    def _penalty_curvature(self, q: jnp.ndarray, data: KineticData):
        """GN curvature of the stance penalties via the closed-form foot
        Jacobians. Returns (Hdiag_add (N,54,54), Hl1_add (N,54,54): the
        (t, t-1) band-1 blocks from the slip term's finite difference)."""
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        h = data.base.h
        fv = data.base.frame_valid
        C_all = jnp.asarray(sk.bottom_coefficients(self.subject), dtype)
        idx = [sk.LINK_INDEX[n] for n in dyn.FEET_LINKS]
        C_feet = C_all[:, idx, :]
        pts, Jf = jax.vmap(
            lambda qt: sk.points_and_jacobian_from_coeffs(qt, C_feet))(q)
        # foot-height box: cost = w_h sum relu(|z - gz| - hb)^2;
        # GN = 2 w_h Jz^T Jz
        hviol = jnp.maximum(jnp.abs(pts[..., 2] - data.ground_z)
                            - cfg.foot_height_bound, 0.0)
        act_h = (hviol > 0).astype(dtype) * data.stance * fv[:, None]
        Jz = Jf[:, :, 2, :]                                     # (N, 4, 54)
        Hd = 2.0 * cfg.foot_height_penalty * jnp.einsum(
            "tf,tfk,tfl->tkl", act_h, Jz, Jz)
        # no-slip: cost = w_s sum relu(|v| - 1)^2, v = (p_t - p_{t-1})_xy/h.
        # GN on r = relu(|v| - 1): J_r = vhat^T J_v with
        # J_v(t) = J_xy(t)/h, J_v(t-1) = -J_xy(t-1)/h.
        vel = (pts[1:, :, :2] - pts[:-1, :, :2]) / h            # (N-1, 4, 2)
        speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1) + 1e-12)
        sviol = jnp.maximum(speed - 1.0, 0.0)
        act_s = (sviol > 0).astype(dtype) * data.stance[1:] * fv[1:, None]
        vhat = vel / speed[..., None]
        u_t = 1.0 / h * jnp.einsum("tfd,tfdk->tfk", vhat,
                                   Jf[1:, :, :2, :])            # (N-1, 4, 54)
        u_p = 1.0 / h * jnp.einsum("tfd,tfdk->tfk", vhat,
                                   Jf[:-1, :, :2, :])
        ws2 = 2.0 * cfg.no_slip_penalty
        Hd = Hd.at[1:].add(ws2 * jnp.einsum("tf,tfk,tfl->tkl", act_s,
                                            u_t, u_t))
        Hd = Hd.at[:-1].add(ws2 * jnp.einsum("tf,tfk,tfl->tkl", act_s,
                                             u_p, u_p))
        # lower band-1 block H[t, t-1] += -w u_t u_p^T, stored at column t-1
        Hl1 = jnp.zeros((N, NQ, NQ), dtype)
        Hl1 = Hl1.at[:-1].add(-ws2 * jnp.einsum("tf,tfk,tfl->tkl", act_s,
                                                u_t, u_p))
        return Hd, Hl1

    def _smooth_curvature(self, q: jnp.ndarray, data: KineticData):
        """GN curvature of the marker-acceleration smoothing energy: the
        (1,-2,1) stencil spread of S_t = sum_m Jm^T Jm (same structure as the
        EOM channel; Jm varies slowly so the later-frame S approximates the
        cross products)."""
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        h = data.base.h
        fv = data.base.frame_valid
        _, Jm = jax.vmap(
            lambda qt: sk.fk_markers_and_jacobian(qt, self.subject))(q)
        S = jnp.einsum("tmik,tmil->tkl", Jm, Jm)                # (N, 54, 54)
        valid = jnp.zeros(N, dtype)
        if N > 2:
            valid = valid.at[2:].set(fv[2:] * fv[1:-1] * fv[:-2])
        fps2 = 1.0 / (h * h)
        S = S * (2.0 * cfg.smooth_weight_scale * fps2) * valid[:, None, None]
        c = jnp.asarray([1.0, -2.0, 1.0], dtype)
        Hd = jnp.zeros((N, NQ, NQ), dtype)
        Hl = [jnp.zeros((N, NQ, NQ), dtype) for _ in range(2)]
        for a in range(3):
            for b in range(a, 3):
                k = b - a
                seg = jnp.zeros((N, NQ, NQ), dtype)
                if N - b > 0:
                    seg = seg.at[: N - b].set(S[b:])
                if k == 0:
                    Hd = Hd + c[a] * c[b] * seg
                else:
                    Hl[k - 1] = Hl[k - 1] + c[a] * c[b] * seg
        return Hd, Hl[0], Hl[1]

    def _track_cost(self, q: jnp.ndarray, data: KineticData) -> jnp.ndarray:
        """Weighted 3D tracking of the kinematic warm start over relative
        angles (reference kinematic_cost, acinoset_misc.py:531-598) — used
        when 2D reprojections are disabled."""
        from ..models import noise as noise_tables
        A = jnp.asarray(sk._A_REL_FULL, q.dtype)
        M = jnp.asarray(noise_tables.KINEMATIC_M, q.dtype)
        r = jnp.einsum("ij,tj->ti", A, q - data.q_warm)
        return jnp.sum(data.base.frame_valid[:, None] * M[None, :] * r * r)

    def _weld_cost(self, q: jnp.ndarray, data: KineticData,
                   loss_scale=1.0) -> jnp.ndarray:
        """Quadratic pin of the reference's revolute/Hooke joint manifold
        (sk.joint_residuals): the relative rotation of every leg pair must
        be a pure y-rotation, tail pairs Hooke-yz. Nonlinear in Euler
        coordinates — angle-difference rows are wrong by up to pi at the
        reference's own solutions. Continuation-scaled like the EOM."""
        r = jax.vmap(lambda qt: sk.joint_residuals(qt))(q)
        return self._eom_ramp(loss_scale) * self.config.weld_weight \
            * jnp.sum(data.base.frame_valid[:, None] * r * r)

    def _cost(self, q: jnp.ndarray, data: KineticData,
              loss_scale: jnp.ndarray = 1.0) -> jnp.ndarray:
        base_cost = self._kin._cost(q, data.base, loss_scale)
        # remove the kinematic const-acc model (not part of the kinetic
        # objective; dynamics take its place) — unless keep_acc_model
        if self.config.keep_acc_model:
            acc = jnp.zeros((), q.dtype)
        else:
            acc = kin.acc_cost(q, data.base.h, data.base.acc_weight,
                               data.base.frame_valid)
        eom_cost, torque_cost, _ = self._physics_costs(q, data, loss_scale)
        pen = self._stance_penalties(q, data) \
            + self._weld_cost(q, data, loss_scale)
        if self.config.use_2d_reprojections:
            extra = self._smooth_cost(q, data)
        else:
            # tracking mode: caller supplies zeroed measurement weights;
            # the marker-smoothing energy is replaced by the torque prior
            # already present (reference acinoset_opt.py:911-913)
            extra = self._track_cost(q, data)
        return base_cost - acc + eom_cost + torque_cost + extra + pen

    def objective(self, q, data) -> float:
        """Reference-scaled objective 1e-3*(meas + pose + prior + 1e4 slack)."""
        return 1e-3 * float(self.cost(q, data)
                            - self._kin._limit_cost(q, data.base.frame_valid)
                            - self._stance_penalties(q, data)
                            - self._weld_cost(q, data))

    def forces(self, q: jnp.ndarray, data: KineticData):
        """Solved per-frame (tau, grf_z, grf_xy) at the current q."""
        _, _, extras = self._physics_costs(q, data)
        return extras[1], extras[2], extras[3]

    # ------------------------------------------------------------------
    # normal equations
    # ------------------------------------------------------------------
    def eom_curvature_blocks(self, q: jnp.ndarray, data: KineticData):
        """Exact-GN banded blocks of the eliminated-EOM term at q.

        Per residual frame r the projected Jacobians PJ[r, a] (a = offset to
        q_{r-a}, see _frame_curv_channels) give block (r-a, r-b) the
        contribution 2 we PJ[r,a]^T PJ[r,b] — a PSD assembly by
        construction. With the epsilon-insensitive slack, rows inside the
        deadband are masked out (their gradient is zero, so keeping their
        stiffness would freeze measurement-driven motion).

        The blocks depend on q only through (M, Coriolis, projector), all of
        which vary slowly along an LM descent — so the production solver
        computes them ONCE at the warm start and reuses them every
        iteration (frozen Gauss-Newton: gradients stay exact, only the
        quadratic model lags; this also removes the EOM curvature assembly
        from the per-iteration hot path entirely).

        Returns (Hdiag_add (N,54,54), Hl1_add, Hl2_add).
        """
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        valid = self._eom_valid(data)
        q3 = self._q3_stack(q)
        curv = lambda q3t, st, gf, gxf: self._frame_curv_channels(
            q3t, data, st, gf, gxf)
        if cfg.curv_chunk > 0:
            PJ = jax.lax.map(lambda xs: curv(*xs),
                             (q3, data.stance, data.grf_fixed,
                              data.grf_xy_fixed),
                             batch_size=cfg.curv_chunk)          # (N,3,d,d)
        else:
            PJ = jax.vmap(curv)(
                q3, data.stance, data.grf_fixed, data.grf_xy_fixed)
        db = self._deadband(dtype)
        if db is not None:
            anchor = jnp.broadcast_to(data.tau_anchor,
                                      (q.shape[0], dyn.N_TAU))
            slack, _, _, _ = jax.vmap(
                lambda q3t, st, gf, gxf, an: self._frame_eom_terms(
                    q3t, data, st, gf, gxf, an))(
                q3, data.stance, data.grf_fixed, data.grf_xy_fixed, anchor)
            act = (jnp.abs(slack) > db).astype(dtype)        # (N, 54)
            PJ = PJ * act[:, None, :, None]
        w = (2.0 * cfg.eom_weight) * valid                   # (N,)
        Hd = jnp.zeros((N, NQ, NQ), dtype)
        Hl = [jnp.zeros((N, NQ, NQ), dtype) for _ in range(2)]
        for a in range(3):
            for b in range(a, 3):
                prod = jnp.einsum("r,rik,ril->rkl", w, PJ[:, a], PJ[:, b])
                k = b - a
                if k == 0:
                    Hd = Hd.at[: N - a].add(prod[a:])
                else:
                    # block (r-a, r-b), lower band k, column t = r-b
                    Hl[k - 1] = Hl[k - 1].at[: N - b].add(prod[b:])
        return Hd, Hl[0], Hl[1]

    def _normal(self, q: jnp.ndarray, data: KineticData,
                loss_scale: jnp.ndarray = 1.0, eom_blocks=None):
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        g_base, H_base = self._kin._normal(q, data.base, loss_scale)
        if cfg.keep_acc_model:
            g = g_base
            Hdiag, Hlower = H_base.diag, H_base.lower
        else:
            # subtract the kinematic const-acc quadratic (grad and curvature)
            H_acc = kin.acc_banded(data.base.h, data.base.acc_weight,
                                   data.base.frame_valid)
            g = g_base - banded.matvec(H_acc, q)
            Hdiag = H_base.diag - H_acc.diag
            Hlower = H_base.lower - H_acc.lower

        # exact gradients of the physics terms by reverse mode
        def phys(qq):
            e, t, _ = self._physics_costs(qq, data, loss_scale)
            return e + t

        g = g + jax.grad(phys)(q)
        if cfg.use_2d_reprojections:
            g = g + jax.grad(lambda qq: self._smooth_cost(qq, data))(q)
        g = g + jax.grad(lambda qq: self._stance_penalties(qq, data))(q)

        # joint-structure weld: exact gradient + frame-local GN curvature
        # 2w J^T J with J = d(joint_residuals)/dq_t, continuation-scaled
        fv = data.base.frame_valid
        rw = jax.vmap(lambda qt: sk.joint_residuals(qt))(q)    # (N, 74)
        Jw = jax.vmap(jax.jacfwd(
            lambda qt: sk.joint_residuals(qt)))(q)             # (N, 74, 54)
        ww = 2.0 * cfg.weld_weight * self._eom_ramp(loss_scale)
        g = g + ww * fv[:, None] * jnp.einsum("trj,tr->tj", Jw, rw)
        Hdiag_w = ww * fv[:, None, None] \
            * jnp.einsum("tri,trj->tij", Jw, Jw)

        if eom_blocks is None:
            eom_blocks = self.eom_curvature_blocks(q, data)
        ed, el1, el2 = eom_blocks
        ramp = self._eom_ramp(loss_scale)
        Hdiag = Hdiag + ramp * ed + Hdiag_w
        Hlower = Hlower.at[0].add(ramp * el1)
        Hlower = Hlower.at[1].add(ramp * el2)

        # stance penalties: exact GN blocks (round 1 supplied only gradients,
        # so multi-1e9 penalty values produced wild steps the LM loop spent
        # its whole budget damping — the "inert physics stage")
        Hp_d, Hp_l1 = self._penalty_curvature(q, data)
        Hdiag = Hdiag + Hp_d
        Hlower = Hlower.at[0].add(Hp_l1)
        if self.config.use_2d_reprojections:
            Hs_d, Hs_l1, Hs_l2 = self._smooth_curvature(q, data)
            Hdiag = Hdiag + Hs_d
            Hlower = Hlower.at[0].add(Hs_l1)
            Hlower = Hlower.at[1].add(Hs_l2)

        if not cfg.use_2d_reprojections:
            from ..models import noise as noise_tables
            A54 = jnp.asarray(sk._A_REL_FULL, dtype)
            Mw = jnp.asarray(noise_tables.KINEMATIC_M, dtype)
            Htrack = 2.0 * jnp.einsum("ia,i,ib->ab", A54, Mw, A54)
            g = g + jax.grad(lambda qq: self._track_cost(qq, data))(q)
            Hdiag = Hdiag + data.base.frame_valid[:, None, None] \
                * Htrack[None]

        return g, banded.BlockBanded(diag=Hdiag, lower=Hlower)

    # ------------------------------------------------------------------
    def make_solver(self, stages=((3.0, 40), (1.7, 40), (1.0, 100)),
                    ftol: float = 1e-9,
                    lam0: float = 10.0, linear_solver: str = "cr",
                    driver: str = "while"):
        from . import gn as gn_mod
        key = (stages, ftol, lam0, linear_solver, driver)
        if key in self._solve_cache:
            return self._solve_cache[key]

        def run(q0: jnp.ndarray, data: KineticData) -> gn_mod.LMState:
            # full-f32 matmul passes: the EOM channel's 1/h^4-scaled
            # curvature and the LM accept/reject cost cannot survive the
            # TPU default bf16 products (same discipline as the kinematic
            # solver, see kinematic.make_solver)
            with jax.default_matmul_precision("highest"):
                # frozen Gauss-Newton: the EOM curvature blocks are computed
                # once at the warm start and reused across iterations
                # (gradients stay exact; see eom_curvature_blocks)
                blocks = self.eom_curvature_blocks(q0, data)
                cost_fn = lambda qq, s: self._cost(qq, data, s)
                normal_fn = lambda qq, s: self._normal(
                    qq, data, s, eom_blocks=blocks)
                # damping floor at the kinematic const-acc curvature scale:
                # flat directions (welded-joint coords) otherwise take
                # ~70 rad trial steps under pure relative Marquardt damping
                # (the kinematic stage carries this curvature in its model;
                # the kinetic stage uses it for step control only)
                H_acc = kin.acc_banded(data.base.h, data.base.acc_weight,
                                       data.base.frame_valid)
                floor = jnp.maximum(
                    jnp.diagonal(H_acc.diag, axis1=-2, axis2=-1), 1e-8)
                guard_fn, guard_cap = None, None
                if self.config.meas_guard > 0.0:
                    def guard_fn(qq):
                        return self._kin._cost(qq, data.base, 1.0) \
                            - kin.acc_cost(qq, data.base.h,
                                           data.base.acc_weight,
                                           data.base.frame_valid)
                    guard_cap = self.config.meas_guard * guard_fn(q0) \
                        + 10.0 * q0.shape[0]
                solver = (gn_mod.lm_solve_annealed_scan if driver == "scan"
                          else gn_mod.lm_solve_annealed)
                return solver(
                    cost_fn, normal_fn, q0, stages,
                    gn_mod.LMConfig(ftol=ftol, lam0=lam0,
                                    diag_floor=floor, step_cap=0.25,
                                    linear_solver=linear_solver),
                    guard_fn=guard_fn, guard_cap=guard_cap)

        run_jit = jax.jit(run)
        self._solve_cache[key] = run_jit
        return run_jit


def stance_matrix(contacts: dict, start_frame: int, n_frames: int
                  ) -> np.ndarray:
    """(N, 4) stance indicator from an autogen-contact.json dict."""
    out = np.zeros((n_frames, dyn.N_FEET))
    for i, name in enumerate(dyn.FOOT_NAMES):
        seqs = contacts.get(name)
        if seqs is None:
            continue
        for seq in seqs:
            s = max(seq[0] - start_frame, 0)
            e = min(seq[1] - start_frame + 1, n_frames)
            out[s:e, i] = 1.0
    return out


def prune_stance(stance: np.ndarray, q_warm: np.ndarray,
                 subject: SubjectParams, h: float,
                 max_median_speed: float = 4.0,
                 foot_speed: Optional[np.ndarray] = None,
                 max_edge_speed: float = 2.0) -> np.ndarray:
    """Drop physically impossible stance windows and trim swing-phase edges.

    The heuristic detector (contact_detection) occasionally emits a window
    where the warm-start foot is travelling at gallop speed (e.g. a
    zero-crossing artifact at the trial boundary); prescribing no-slip there
    injects multi-1e5 penalties *at the true solution* and drags the physics
    stage away from it. A window whose median warm-start foot xy-speed
    exceeds ``max_median_speed`` (m/s; true stance is < 1) is removed.

    The detector also places a fixed-length window (the Hudson stance-time
    model) around each height minimum, which routinely overshoots touchdown/
    liftoff by 1-2 frames — measured on the reference's dynamically
    consistent fte_kinetic solutions, window interiors move at <=1.5 m/s
    while the overshot edges swing at 4-7 m/s, so anchoring them injects
    ~1e4 of no-slip/height penalty *at the true solution*. Edge frames whose
    warm-start speed exceeds ``max_edge_speed`` are trimmed off.

    ``foot_speed`` (N, 4): precomputed xy speeds — pass them when foot
    kinematics were already evaluated batched (bench_lib/pipeline hot
    paths), avoiding a per-trial FK jit on the host.
    """
    if foot_speed is not None:
        v = np.asarray(foot_speed)
    else:
        import jax as _jax
        pts = np.asarray(_jax.vmap(
            lambda qq: dyn.foot_points(jnp.asarray(qq), subject))(
            jnp.asarray(q_warm)))
        v = np.zeros(pts.shape[:2])
        v[1:] = np.linalg.norm((pts[1:, :, :2] - pts[:-1, :, :2]) / h,
                               axis=-1)
        v[0] = v[1] if len(v) > 1 else 0.0
    out = stance.copy()
    for f in range(stance.shape[1]):
        on = np.flatnonzero(stance[:, f] > 0)
        if on.size == 0:
            continue
        splits = np.split(on, np.flatnonzero(np.diff(on) > 1) + 1)
        for run in splits:
            if np.median(v[run, f]) > max_median_speed:
                out[run, f] = 0.0
                continue
            s_i, e_i = 0, len(run)
            while s_i < e_i and v[run[s_i], f] > max_edge_speed:
                s_i += 1
            while e_i > s_i and v[run[e_i - 1], f] > max_edge_speed:
                e_i -= 1
            out[run[:s_i], f] = 0.0
            out[run[e_i:], f] = 0.0
    return out
