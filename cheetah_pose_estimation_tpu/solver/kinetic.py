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
    tau_anchor: jnp.ndarray = jnp.zeros((1, dyn.N_TAU))   # (N, 22) or (1, 22)
    tau_anchor_weight: jnp.ndarray = jnp.asarray(0.0)


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

    def _frame_eom_terms(self, q3: jnp.ndarray, data: KineticData,
                         stance_t, grf_z_fix, grf_xy_fix,
                         tau_anchor_t=None):
        """EOM slack for one frame given (q[t-2], q[t-1], q[t]) stacked (3,54).

        Returns (slack (54,), tau (22,), grf_z (4,), grf_xy (4,4)).
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
        rhs = we * (A.T @ lhs_eff)
        if tau_anchor_t is not None:
            rhs = rhs.at[:dyn.N_TAU].add(wa * tau_anchor_t)
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
        z = sc * jax.scipy.linalg.cho_solve((L, True), sc * rhs)
        tau = z[:dyn.N_TAU]
        g = z[dyn.N_TAU:]
        # projection: GRF nonnegative, friction polyhedron
        gz = jnp.maximum(g[:4], 0.0) * gmask_z * use_free_grf
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
        heights = pts[..., 2]                                   # (N, 4)
        hb = cfg.foot_height_bound
        hviol = jnp.maximum(jnp.abs(heights) - hb, 0.0)
        height_pen = cfg.foot_height_penalty * jnp.sum(
            (fv[:, None] * data.stance) * hviol * hviol)
        vel_xy = (pts[1:, :, :2] - pts[:-1, :, :2]) / h
        speed2 = jnp.sum(vel_xy * vel_xy, axis=-1)              # (N-1, 4)
        sviol = jnp.maximum(speed2 - 1.0, 0.0)
        slip_pen = cfg.no_slip_penalty * jnp.sum(
            (fv[1:, None] * data.stance[1:]) * sviol * sviol)
        return height_pen + slip_pen

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
        channel): H ~ sum_t we (c_a c_b / h^4) M_t^T M_t between frames
        (t-a, t-b), with c the ddq stencil (q_t, q_{t-1}, q_{t-2})."""
        cfg = self.config
        dtype = q.dtype
        N = q.shape[0]
        h = data.base.h
        valid = self._eom_valid(data)
        M_all = jax.vmap(
            lambda qt: dyn.mass_matrix(qt, self.subject))(q) / self.force_scale
        MtM = jnp.einsum("tij,tik->tjk", M_all, M_all) \
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
        g = g + jax.grad(lambda qq: self._smooth_cost(qq, data))(q)
        g = g + jax.grad(lambda qq: self._stance_penalties(qq, data))(q)

        h = data.base.h
        Hdiag, Hlower = self._eom_curvature(q, data, Hdiag, Hlower)

        # smoothing + stance penalties: cheap diagonal GN via marker Jacobian
        # magnitude — approximate with a scaled identity; LM damping handles
        # the remainder (their gradients above are exact).
        fps = 1.0 / h
        smooth_diag = 6.0 * cfg.smooth_weight_scale * (fps ** 2)
        Hdiag = Hdiag + smooth_diag * jnp.eye(NQ, dtype=dtype)[None]

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
    def make_solver(self, stages=((3.0, 20), (1.0, 80)), ftol: float = 1e-9,
                    lam0: float = 1e-2, linear_solver: str = "scan",
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
