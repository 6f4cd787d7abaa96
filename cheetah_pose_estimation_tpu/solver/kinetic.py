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
    use_gmm: bool = False
    kinetic_dataset: bool = False
    limit_penalty: float = 1e5
    tikhonov: float = 1e-2
    curvature_floor: float = 1e-3
    eom_weight: float = 1e4          # 10e3 in reference units
    torque_weight: float = 1.0
    smooth_weight_scale: float = 0.1  # x fps^-2 on marker acceleration
    no_slip_penalty: float = 1e3
    foot_height_penalty: float = 1e4
    foot_height_bound: float = 0.1   # 0.03 kinetic dataset
    friction_coeff: float = 0.8
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


class KineticFTE:
    """Jitted cost/normal for the physics-based FTE."""

    def __init__(self, config: KineticConfig, subject: SubjectParams):
        self.config = config
        self.subject = subject
        kcfg = kin.KinematicConfig(
            fisheye=config.fisheye, robust=config.robust,
            use_gmm=config.use_gmm, kinetic_dataset=config.kinetic_dataset,
            limit_penalty=config.limit_penalty, tikhonov=config.tikhonov,
            curvature_floor=config.curvature_floor,
            cam_multipliers=config.cam_multipliers)
        self._kin = kin.KinematicFTE(kcfg, subject)
        self.force_scale = subject.total_mass * dyn.GRAVITY
        self.cost = jax.jit(self._cost)
        self.normal = jax.jit(self._normal)
        self._solve_cache = {}

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

    def _frame_eom_terms(self, q3: jnp.ndarray, data: KineticData,
                         stance_t, grf_z_fix, grf_xy_fix,
                         tau_anchor_t=None):
        """EOM slack for one frame given (q[t-2], q[t-1], q[t]) stacked (3,54).

        Returns (slack (54,), tau (22,), grf_z (4,), grf_xy (4,4)).
        """
        cfg = self.config
        M, lhs_eff, A, Cg, gmask, sc, L = self._frame_system(
            q3, data, stance_t, grf_z_fix, grf_xy_fix)
        gmask_z = stance_t
        use_free_grf = (1.0 - data.use_fixed_grf)
        we = cfg.eom_weight
        wa = data.tau_anchor_weight
        rhs = we * (A.T @ lhs_eff)
        if tau_anchor_t is not None:
            rhs = rhs.at[:dyn.N_TAU].add(wa * tau_anchor_t)
        z = sc * jax.scipy.linalg.cho_solve((L, True), sc * rhs)
        tau = z[:dyn.N_TAU]
        g = z[dyn.N_TAU:]
        # projection: GRF nonnegative (with the prescribed-stance floor,
        # reference min_GRFz), friction polyhedron
        gz = jnp.maximum(g[:4], cfg.min_grf_z) * gmask_z * use_free_grf
        gxy = jnp.maximum(g[4:].reshape(4, 4), 0.0) \
            * stance_t[:, None] * use_free_grf
        cone = cfg.friction_coeff * gz / jnp.maximum(gxy.sum(axis=1), 1e-9)
        gxy = gxy * jnp.minimum(cone, 1.0)[:, None]
        gz_out = data.use_fixed_grf * grf_z_fix * gmask_z + gz
        gxy_out = data.use_fixed_grf * grf_xy_fix * stance_t[:, None] + gxy
        zproj = jnp.concatenate([
            tau, jnp.concatenate([gz, gxy.reshape(16)]) ])
        slack = lhs_eff - A @ zproj
        return slack, tau, gz_out, gxy_out

    def _frame_eom_curv(self, q3: jnp.ndarray, data: KineticData,
                        stance_t, grf_z_fix, grf_xy_fix) -> jnp.ndarray:
        """Reduced GN curvature kernel (54, 54) of the eliminated EOM term.

        The per-frame elimination of (tau, grf) makes the effective residual
        sqrt(we) * P (lhs(q) - const) with P = I - we A K A^T the oblique
        projector onto the torque/GRF-unexplainable subspace (K the inverse
        reduced normal matrix). Using the full M^T M here (round-1 bug) says
        the EOM resists motion in *actuated* directions it does not actually
        resist — overestimating curvature by ~we/ridge in ~34/54 directions
        and freezing the optimizer on its warm start. The correct kernel is
        (M/fs)^T P (M/fs), which the ddq stencil then spreads over frame
        pairs (see _eom_curvature)."""
        M, _, A, _, _, sc, L = self._frame_system(
            q3, data, stance_t, grf_z_fix, grf_xy_fix)
        we = self.config.eom_weight
        Asc = A * sc[None, :]
        X = jax.scipy.linalg.cho_solve((L, True), Asc.T)      # (42, 54)
        P = jnp.eye(NQ, dtype=q3.dtype) - we * (Asc @ X)
        Mfs = M / self.force_scale
        MPM = Mfs.T @ (P @ Mfs)
        return 0.5 * (MPM + MPM.T)

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
    def _physics_costs(self, q: jnp.ndarray, data: KineticData):
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
        eom_cost = cfg.eom_weight * jnp.sum(
            valid[:, None] * slack * slack)
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

    def _cost(self, q: jnp.ndarray, data: KineticData,
              loss_scale: jnp.ndarray = 1.0) -> jnp.ndarray:
        base_cost = self._kin._cost(q, data.base, loss_scale)
        # remove the kinematic const-acc model (not part of the kinetic
        # objective; dynamics take its place)
        acc = kin.acc_cost(q, data.base.h, data.base.acc_weight,
                           data.base.frame_valid)
        eom_cost, torque_cost, _ = self._physics_costs(q, data)
        pen = self._stance_penalties(q, data)
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
                            - self._stance_penalties(q, data))

    def forces(self, q: jnp.ndarray, data: KineticData):
        """Solved per-frame (tau, grf_z, grf_xy) at the current q."""
        _, _, extras = self._physics_costs(q, data)
        return extras[1], extras[2], extras[3]

    # ------------------------------------------------------------------
    # normal equations
    # ------------------------------------------------------------------
    def _eom_curvature(self, q: jnp.ndarray, data: KineticData,
                       Hdiag: jnp.ndarray, Hlower: jnp.ndarray):
        """Add the EOM term's generalized-GN curvature (dominant 1/h^2
        channel): H ~ sum_t we (c_a c_b / h^4) M_t^T P_t M_t between frames
        (t-a, t-b), with c the ddq stencil (q_t, q_{t-1}, q_{t-2}) and P_t
        the per-frame elimination projector (see _frame_eom_curv)."""
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        h = data.base.h
        valid = self._eom_valid(data)
        q3 = self._q3_stack(q)
        MtM = jax.vmap(
            lambda q3t, st, gf, gxf: self._frame_eom_curv(
                q3t, data, st, gf, gxf))(
            q3, data.stance, data.grf_fixed, data.grf_xy_fixed) \
            * (2.0 * cfg.eom_weight / h**4) * valid[:, None, None]
        c = jnp.asarray([1.0, -2.0, 1.0], dtype)
        # residual at frame r uses q[r-a] with coefficient c[a]
        for a in range(3):
            for b in range(a, 3):
                k = b - a
                contrib = c[a] * c[b]
                # block (r-a, r-b): lower band k, at column t=r-b
                if k == 0:
                    seg = jnp.zeros((N, NQ, NQ), dtype)
                    seg = seg.at[: N - a].set(MtM[a:])
                    Hdiag = Hdiag + contrib * seg
                else:
                    seg = jnp.zeros((N, NQ, NQ), dtype)
                    if N - b > 0:
                        seg = seg.at[: N - b].set(MtM[b:])
                    Hlower = Hlower.at[k - 1].add(contrib * seg)
        return Hdiag, Hlower

    def _normal(self, q: jnp.ndarray, data: KineticData,
                loss_scale: jnp.ndarray = 1.0):
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        g_base, H_base = self._kin._normal(q, data.base, loss_scale)
        # subtract the kinematic const-acc quadratic (grad and curvature)
        H_acc = kin.acc_banded(data.base.h, data.base.acc_weight,
                               data.base.frame_valid)
        g = g_base - banded.matvec(H_acc, q)
        Hdiag = H_base.diag - H_acc.diag
        Hlower = H_base.lower - H_acc.lower

        # exact gradients of the physics terms by reverse mode
        def phys(qq):
            e, t, _ = self._physics_costs(qq, data)
            return e + t

        g = g + jax.grad(phys)(q)
        if cfg.use_2d_reprojections:
            g = g + jax.grad(lambda qq: self._smooth_cost(qq, data))(q)
        g = g + jax.grad(lambda qq: self._stance_penalties(qq, data))(q)

        Hdiag, Hlower = self._eom_curvature(q, data, Hdiag, Hlower)

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
    def make_solver(self, stages=((3.0, 30), (1.0, 120)), ftol: float = 1e-9,
                    lam0: float = 10.0, linear_solver: str = "scan",
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
                cost_fn = lambda qq, s: self._cost(qq, data, s)
                normal_fn = lambda qq, s: self._normal(qq, data, s)
                solver = (gn_mod.lm_solve_annealed_scan if driver == "scan"
                          else gn_mod.lm_solve_annealed)
                return solver(
                    cost_fn, normal_fn, q0, stages,
                    gn_mod.LMConfig(ftol=ftol, lam0=lam0,
                                    linear_solver=linear_solver))

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
