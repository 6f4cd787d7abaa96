"""High-level trajectory estimation pipeline.

The TPU-native counterpart of the reference's ``CheetahEstimator`` +
``init_trajectory`` / ``estimate_kinematics`` entry points
(``acinoset_opt.py:21-635``): load a trial directory (DLC detections, scene
calibration, metadata), assemble the jitted FTE problem, solve it with the
batched GN/LM solver, and write the AcinoSet-format artifacts
(fte.pickle + cam*_fte reprojections).

Directory layout consumed (identical to the reference):

  <root_dir>/<data_path>/
      metadata.json                        start/end frame, cam_sync, ...
      dlc/cam*.h5|.csv                     DLC predictions
      (walk up) extrinsic_calib/N_cam_scene_sba.json

Outputs land in ``fte_kinematic`` (multi-view), ``fte_kinematic_orig_<cam>``
(monocular default), ``fte_kinematic_<cam>`` (data-driven), matching
``acinoset_opt.py:626-628``.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import io as dio
from ..utils import data_ops
from ..models import noise as noise_tables
from ..models import params as params_mod
from ..models import skeleton as sk
from ..ops import camera as cam_ops
from ..parallel import batch as pbatch
from ..priors import armodel, gmm as gmm_mod
from ..solver import kinematic as kin
from . import initialization as init_mod

def _default_data_driven_dataset() -> str:
    """Training dataset for the learned priors. Resolution order: env var,
    local ./models/data-driven (the reference's location convention), the
    mounted reference snapshot."""
    cands = [os.environ.get("CHEETAH_DATA_DRIVEN_DATASET"),
             os.path.join(".", "models", "data-driven",
                          "dataset_full_pose.h5"),
             os.path.join(".", "models", "data-driven",
                          "dataset_full_pose.csv"),
             "/root/reference/models/data-driven/dataset_full_pose.csv"]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return cands[1]


DATA_DRIVEN_DATASET = _default_data_driven_dataset()

# Data-driven base-pose anchor (solver.kinematic base_ref/base_anchor_*):
# pin the GMM/AR-constrained solves' base to the prior-free solution so the
# pose prior cannot corrupt global depth (round-5 forced-vs-gated study:
# unanchored forced priors cost +25..+150 mm MPE per trial at near-
# unchanged MPJPE). The TRANSLATION pin is stiff (1.6e3 ~ sigma 2.5 cm —
# experiments/dd_fix_test D-sweep on chip: trans 4e2/1.6e3/4e3 give bench
# dd MPE 148.1/137.3/139.5 at CoM-vel 1.381/1.379/1.386; the stiffer pin
# keeps the priors from leaving base-translation drift that muddies the
# depth line-scan's cost landscape, so the scan corrects 6 trials instead
# of 4). The ROTATION pin stays soft (1e2): a stiff rotation pin blocks
# the prior's bad-basin rescues (trial 2019_03_03 MPJPE stays 151 vs 126).
DD_BASE_ANCHOR = dict(base_anchor_trans=1.6e3, base_anchor_rot=1e2)

# Prior-confidence gate threshold (chain / prior-free cost ratio). With
# the base anchor bounding global-depth damage and the depth line-scan
# backstopping residual drift, the gate's job narrows to rejecting POSE
# harm (e.g. 2017_09_02/top/phantom/run1_2: forced MPJPE 48->61 at ratio
# 1.33) — 1.30 engages the prior on 8/10 bench trials while still
# rejecting the measured pose-harm outliers (round 4's 1.10 engaged 3/10
# and its accept/reject pattern was nearly uncorrelated with quality).
PRIOR_GUARD_RATIO = 1.30


def prior_gate_accept(c_chain, c_free, guard_ratio: float = None):
    """Per-trial prior gate: the GMM chain is accepted when its PRIOR-FREE
    cost does not exceed the prior-free solve's by more than
    (guard_ratio - 1) x the cost's magnitude.

    NOT a plain ratio test: the smoothed redescending measurement loss is
    slightly NEGATIVE at well-fit residuals (min -0.216 near e=0.06 — the
    sigmoid blending of the reference's three-part formula,
    acinoset_misc.py:1998-2016), so totals go negative on well-fit trials
    and ``c_chain <= r * c_free`` silently INVERTS for c_free < 0 (round-5
    measured: two clear prior-win trials with ratios 0.86/0.57 were
    rejected for exactly this). Works elementwise on arrays.
    """
    import numpy as _np

    if guard_ratio is None:
        guard_ratio = PRIOR_GUARD_RATIO
    c_chain = _np.asarray(c_chain, _np.float64)
    c_free = _np.asarray(c_free, _np.float64)
    margin = (guard_ratio - 1.0) * _np.maximum(_np.abs(c_free), 1.0)
    return c_chain <= c_free + margin


@dataclasses.dataclass
class TrajectoryParams:
    """Per-trial configuration (reference acinoset_misc.py:41-52)."""
    data_dir: str
    start_frame: int
    end_frame: int
    total_length: int
    dlc_thresh: float
    sync_offset: Optional[List[Dict]]
    hand_labeled_data: bool
    kinetic_dataset: bool
    enable_shutter_delay_estimation: bool
    enable_ppms: bool
    # metadata.json ground_plane_height (reference acinoset_opt.py:464-472,
    # 500): the trial world frame's ground elevation — NOT 0 for AcinoSet
    ground_plane_height: float = 0.0


@dataclasses.dataclass
class Scene:
    """Calibrated camera rig (reference acinoset_misc.py:55-65)."""
    scene_fpath: str
    k_arr: np.ndarray
    d_arr: np.ndarray
    r_arr: np.ndarray
    t_arr: np.ndarray
    cam_res: tuple
    fps: float
    n_cams: int
    cam_idx: Optional[int] = None


@dataclasses.dataclass
class CheetahEstimator:
    name: str
    data_path: str
    subject: params_mod.SubjectParams
    params: TrajectoryParams
    scene: Scene
    kinematic_model: bool = True
    # filled by estimate_* calls
    q: Optional[np.ndarray] = None
    q0: Optional[np.ndarray] = None
    data: Optional[kin.KinematicData] = None
    fte: Optional[kin.KinematicFTE] = None
    com_pos: Optional[np.ndarray] = None
    com_vel: Optional[np.ndarray] = None
    opt_time_s: Optional[float] = None
    obj_cost: Optional[float] = None
    costs: Optional[Dict] = None
    xy: Optional[np.ndarray] = None       # (F, C, L, 2) raw detections
    likelihood: Optional[np.ndarray] = None
    tau: Optional[np.ndarray] = None      # (N, 22) solved joint torques
    grf_z: Optional[np.ndarray] = None    # (N, 4)
    grf_xy: Optional[np.ndarray] = None   # (N, 4, 4)
    shutter_delay: Optional[np.ndarray] = None  # (C,) seconds

    @property
    def scale_forces_by(self) -> float:
        return self.subject.total_mass * 9.81

    def load(self, fte_name: str, out_dir_prefix: Optional[str] = None):
        """Load a previously saved solution's state (reference
        CheetahEstimator.load, acinoset_opt.py:272-276 — which restores the
        pyomo variable pickle; here the q-trajectory in fte.pickle IS the
        full state)."""
        base = (os.path.join(out_dir_prefix, self.data_path)
                if out_dir_prefix else self.params.data_dir)
        d = dio.load_fte_pickle(os.path.join(base, fte_name, "fte.pickle"))
        self.q = np.asarray(d["q"])
        self.com_pos = d.get("com_pos")
        self.com_vel = d.get("com_vel")
        self.obj_cost = d.get("obj_cost")
        return d

    # -- derived state -------------------------------------------------------
    def derivatives(self):
        """Reconstruct the eliminated implicit-Euler collocation variables
        dq/ddq (reference keeps them as pyomo vars; the elimination is exact,
        see solver.kinematic module docstring)."""
        q = self.q
        h = 1.0 / self.scene.fps
        N = q.shape[0]
        dq = np.zeros_like(q)
        ddq = np.zeros_like(q)
        dq[1:] = (q[1:] - q[:-1]) / h
        ddq[2:] = (dq[2:] - dq[1:-1]) / h
        if N > 2:
            ddq[1] = ddq[2] if N > 2 else 0.0
            ddq[0] = ddq[1]
            dq[0] = dq[1] - h * ddq[1]
        return dq, ddq

    def solution_details(self) -> Dict[str, float]:
        """Print (and return) the total objective, the per-term cost
        breakdown, and any estimated shutter delays (reference
        ``solution_details``, acinoset_opt.py:388-398)."""
        out: Dict[str, float] = {}
        if self.fte is not None and self.q is not None \
                and self.data is not None and hasattr(self.fte,
                                                      "cost_terms"):
            # same matmul precision as the solver's fused cost, and the
            # total is the SUM of the printed terms (evaluating the fused
            # cost separately at a different precision would make the
            # breakdown disagree with the total on TPU)
            with jax.default_matmul_precision("highest"):
                terms = self.fte.cost_terms(jnp.asarray(self.q), self.data)
            out.update({k: float(v) for k, v in terms.items()})
            out["cost"] = float(sum(out.values()))
        elif self.obj_cost is not None:
            out["cost"] = float(self.obj_cost)
        print("Total cost:", out.get("cost"))
        for k, v in out.items():
            if k != "cost":
                print(f"-- {k}: {v}")
        if self.shutter_delay is not None:
            print("Shutter delay estimation:",
                  list(np.asarray(self.shutter_delay)))
        return out

    def is_solution_acceptable(self) -> bool:
        """Finite objective and state (the reference gates on IPOPT's
        solver status, acinoset_opt.py:400-406; the LM solver has no
        external status — non-finite values are the failure signal)."""
        return (self.q is not None and bool(np.all(np.isfinite(self.q)))
                and self.obj_cost is not None
                and bool(np.isfinite(self.obj_cost)))

    def get_objective_cost(self) -> float:
        """Reference-scaled objective value (acinoset_opt.py:408-410)."""
        return float(self.obj_cost) if self.obj_cost is not None \
            else float("nan")

    def save(self, out_dir_name: str, fname: str = "fte",
             out_dir_prefix: Optional[str] = None) -> str:
        """Write fte.pickle + per-camera reprojections (reference
        CheetahEstimator.save, acinoset_opt.py:278-373)."""
        base = (os.path.join(out_dir_prefix, self.data_path)
                if out_dir_prefix else self.params.data_dir)
        out_dir = os.path.join(base, out_dir_name)
        q = np.asarray(self.q, dtype=np.float64)
        dq, ddq = self.derivatives()
        positions = np.asarray(sk.fk_markers(q, self.subject))
        x = np.asarray(sk.relative_pose(q))
        dx = np.asarray(sk.relative_pose(dq))
        ddx = np.asarray(sk.relative_pose(ddq))
        com = np.asarray(sk.com_position(q, self.subject))
        com_vel = (com[1:] - com[:-1]) * self.scene.fps
        self.com_pos, self.com_vel = com, com_vel
        # measurement slacks: reprojection - measurement for every (c, l, d, w)
        meas_err = self._measurement_slacks(q, positions)
        proj_fn = (cam_ops.project_pinhole if self.params.kinetic_dataset
                   else cam_ops.project_fisheye)
        sync = [0] * self.scene.n_cams
        if self.params.sync_offset:
            for off in self.params.sync_offset:
                sync[off["cam"]] = off["frame"]
        from ..dynamics.eom import tau_as_dict
        tau_dict = tau_as_dict(self.tau) if self.tau is not None else {}
        dio.save_fte_pickle(
            os.path.join(out_dir, f"{fname}.pickle"), positions,
            x=x, dx=dx, ddx=ddx, q=q, dq=dq, ddq=ddq, com_pos=com,
            com_vel=com_vel, tau=tau_dict, meas_err=meas_err,
            obj_cost=self.obj_cost, processing_time_s=self.opt_time_s,
            start_frame=self.params.start_frame)
        # per-camera shutter-delay correction of the reprojected positions
        # (reference acinoset_opt.py:343-352)
        positions_arr = []
        for c in range(self.scene.n_cams):
            if self.shutter_delay is not None:
                tau_c = float(self.shutter_delay[c])
                shift = dq[:, :3] * tau_c + ddq[:, :3] * tau_c**2
                positions_arr.append(positions + shift[:, None, :])
            else:
                positions_arr.append(positions)
        dio.save_3d_cheetah_as_2d(
            positions_arr, out_dir, self.scene.k_arr,
            self.scene.d_arr, self.scene.r_arr, self.scene.t_arr,
            self.scene.cam_res,
            lambda X, k, d, r, t: np.asarray(proj_fn(jnp.asarray(X), k, d,
                                                     r, t)),
            self.params.start_frame, sync, out_fname=fname)
        return out_dir

    def _measurement_slacks(self, q, positions):
        data = self.data
        meas = np.asarray(data.meas)
        proj_fn = (cam_ops.project_pinhole if self.params.kinetic_dataset
                   else cam_ops.project_fisheye)
        C = meas.shape[1]
        out = np.zeros_like(meas)
        cam = data.cam
        for c in range(C):
            uv = np.asarray(proj_fn(jnp.asarray(positions.reshape(-1, 3)),
                                    cam.K[c], cam.D[c], cam.R[c],
                                    cam.t[c])).reshape(meas.shape[0],
                                                       meas.shape[2], 2)
            out[:, c] = uv[..., None] - meas[:, c]
        return out


def _fps_for_path(data_path: str, kinetic_dataset: bool) -> float:
    if not kinetic_dataset and "2019" in data_path:
        return 120.0
    if not kinetic_dataset and "2017" in data_path:
        return 90.0
    return 200.0


def init_trajectory(root_dir: str, data_path: str, cheetah_name: str,
                    kinetic_dataset: bool = False,
                    start_frame: int = -1, end_frame: int = -1,
                    dlc_thresh: float = 0.5,
                    kinematic_model: bool = True,
                    monocular_enable: bool = False,
                    override_monocular_cam: Optional[int] = None,
                    enable_ppm: bool = False,
                    hand_labeled_data: bool = False,
                    shutter_delay_estimation: bool = False,
                    **_ignored) -> CheetahEstimator:
    """Load a trial directory and assemble the estimation problem
    (reference acinoset_opt.py:413-536; the IPOPT/solver-path machinery is
    replaced by the jitted GN solver, so solver_path is not needed)."""
    subject = params_mod.get_subject(cheetah_name)
    data_dir = os.path.join(root_dir, data_path)
    assert os.path.exists(data_dir), data_dir

    ground_plane_height = 0.0
    cam_idx = None
    sync_offset = None
    # the reference always reads metadata.json (acinoset_opt.py:464-472);
    # explicit start/end frames only override the window, not the scene
    # facts (sync offsets, ground elevation, monocular camera)
    meta_path = os.path.join(data_dir, "metadata.json")
    if start_frame < 0 or end_frame < 0 or os.path.exists(meta_path):
        meta = dio.load_metadata(data_dir)
        if start_frame < 0 or end_frame < 0:
            start_frame = meta["start_frame"]
            end_frame = meta["end_frame"]
        sync_offset = meta.get("cam_sync")
        ground_plane_height = meta.get("ground_plane_height", 0.0)
        if monocular_enable:
            cam_idx = meta.get("monocular_cam")
    if override_monocular_cam is not None and monocular_enable:
        cam_idx = override_monocular_cam
    total_length = end_frame - start_frame

    k_arr, d_arr, r_arr, t_arr, cam_res, n_cams, scene_fpath = \
        dio.find_scene_file(data_dir)
    d_arr = d_arr.reshape((-1, 4))
    fps = _fps_for_path(data_path, kinetic_dataset)
    params = TrajectoryParams(data_dir, start_frame, end_frame, total_length,
                              dlc_thresh, sync_offset, hand_labeled_data,
                              kinetic_dataset, shutter_delay_estimation,
                              enable_ppm, ground_plane_height)
    scene = Scene(scene_fpath, k_arr, d_arr, r_arr, t_arr, cam_res, fps,
                  n_cams, cam_idx)
    est = CheetahEstimator(cheetah_name, data_path, subject, params, scene,
                           kinematic_model)
    _load_measurements(est)
    return est


def _load_measurements(est: CheetahEstimator):
    """Read DLC tables, apply sync offsets and frame window, build the
    measurement/weight arrays (reference create_camera_contraints data path,
    acinoset_misc.py:190-256)."""
    p = est.params
    dlc_dir = os.path.join(
        p.data_dir, "dlc" if not p.hand_labeled_data else "dlc_hand_labeled")
    xy, lik, _ = dio.load_dlc_points(dlc_dir, est.scene.n_cams)
    sync = [0] * est.scene.n_cams
    if p.sync_offset:
        for off in p.sync_offset:
            sync[off["cam"]] = off["frame"]
    N = p.end_frame - p.start_frame
    C = est.scene.n_cams
    L = len(sk.MARKERS)
    meas = np.zeros((N, C, L, 2))
    likelihood = np.zeros((N, C, L))
    for c in range(C):
        lo = p.start_frame - sync[c]
        hi = lo + N
        lo_c = max(lo, 0)
        hi_c = min(hi, xy.shape[0])
        if hi_c > lo_c:
            meas[lo_c - lo:hi_c - lo, c] = np.nan_to_num(xy[lo_c:hi_c, c])
            likelihood[lo_c - lo:hi_c - lo, c] = lik[lo_c:hi_c, c]
    est.xy = meas
    est.likelihood = likelihood

    if p.enable_ppms:
        # augment with pairwise pseudo-measurements (W = 3)
        from glob import glob as _glob

        from ..data import ppm as ppm_mod
        pw_dir = dlc_dir + "_pw"
        pw_paths = sorted(_glob(os.path.join(pw_dir, "*.pickle")))
        assert len(pw_paths) == C, (pw_paths, C)
        pw_frames = [ppm_mod.load_ppm_pickle(pth) for pth in pw_paths]
        meas_full, weight_full = ppm_mod.assemble_ppm_measurements(
            xy, lik, pw_frames, p.start_frame, N, p.dlc_thresh,
            p.kinetic_dataset)
    else:
        w_rows = noise_tables.measurement_weights(1, p.kinetic_dataset)
        gate = (likelihood > p.dlc_thresh).astype(float)
        weight_full = np.einsum("wl,ncl->nclw", w_rows, gate)
        meas_full = meas[..., None]

    if est.scene.cam_idx is not None:
        ci = est.scene.cam_idx
        meas_s = meas_full[:, ci:ci + 1]
        weight_s = weight_full[:, ci:ci + 1]
        cam = kin.CameraSet(est.scene.k_arr[ci:ci + 1],
                            est.scene.d_arr[ci:ci + 1],
                            est.scene.r_arr[ci:ci + 1],
                            est.scene.t_arr[ci:ci + 1])
    else:
        meas_s = meas_full
        weight_s = weight_full
        cam = kin.CameraSet(est.scene.k_arr, est.scene.d_arr,
                            est.scene.r_arr, est.scene.t_arr)
    gmmp = kin.GMMPrior(np.zeros((1, 22)), np.eye(22)[None], np.zeros((1,)))
    ar = kin.ARAnchor(np.zeros((N, 28)), np.zeros(28), np.zeros(N))
    est.data = kin.KinematicData(
        meas=jnp.asarray(meas_s),
        weight=jnp.asarray(weight_s),
        cam=jax.tree.map(jnp.asarray, cam),
        h=jnp.asarray(1.0 / est.scene.fps),
        acc_weight=jnp.asarray(noise_tables.acc_model_weights()),
        frame_valid=jnp.ones(N), gmm=gmmp, ar=ar)


def estimate_kinematics(est: CheetahEstimator,
                        monocular_constraints: bool = False,
                        disable_pose_prior: bool = False,
                        disable_motion_prior: bool = False,
                        pose_model_num_components: int = 5,
                        motion_model_window_size: int = 4,
                        motion_model_sparse_solution: bool = True,
                        motion_prior_rolling: int = 0,
                        data_driven_dataset: Optional[str] = None,
                        prior_guard_ratio: Optional[float] = None,
                        ground_anchor: bool = True,
                        depth_scan: bool = True,
                        out_dir_prefix: Optional[str] = None,
                        solver_output: bool = False,
                        save: bool = True) -> bool:
    """Kinematic FTE (reference acinoset_opt.py:539-635).

    ``motion_prior_rolling``: extra outer refinements of the AR motion prior.
    The reference computes the AR predictions ONCE from the initialization
    and anchors the solution to them (acinoset_misc.py:316-328); with
    rolling > 0 the predictions are recomputed from the current solution and
    the problem re-solved (a lagged true-AR prior — improvement over the
    reference semantics, off by default for parity)."""
    p = est.params
    scene = est.scene
    if prior_guard_ratio is None:
        prior_guard_ratio = PRIOR_GUARD_RATIO
    t0 = time.time()
    # initial trajectory from the measurements
    full_weight = np.einsum(
        "wl,ncl->nclw",
        noise_tables.measurement_weights(1, p.kinetic_dataset),
        (est.likelihood > p.dlc_thresh).astype(float))
    q0 = init_mod.initialize_trajectory(
        est.xy[..., None], full_weight, scene.k_arr, scene.d_arr, scene.r_arr,
        scene.t_arr, est.subject, fisheye=not p.kinetic_dataset,
        cam_idx=scene.cam_idx, kinetic_dataset=p.kinetic_dataset)
    est.q0 = q0

    use_priors = monocular_constraints and scene.cam_idx is not None
    use_gmm = use_priors and not disable_pose_prior
    use_ar = use_priors and not disable_motion_prior
    data = est.data
    prior_ok = True
    boot_ran = bool(use_gmm or use_ar)
    if use_gmm or use_ar:
        dset = data_driven_dataset or DATA_DRIVEN_DATASET
        if use_gmm:
            from ..priors import dataset as ds
            df = ds.load_pose_dataset(dset)
            gp = gmm_mod.to_solver_prior(gmm_mod.fit(
                df.iloc[:, 6:28].to_numpy(),
                n_components=pose_model_num_components, seed=42,
                cache_dir=data_ops.prior_cache_dir(dset)))
            data = data._replace(gmm=gp)
        # Bootstrap chain (all measured on the corrupted-monocular
        # benchmark; the reference instead anchors its AR prior on the raw
        # initialization, acinoset_misc.py:316-328, which *degrades* MPJPE
        # 236->271 under correlated DLC corruption):
        #   1. prior-free solve from the init;
        #   2. GMM-constrained refinement warm-started from (1) — at
        #      8%-occlusion/4%-confusion its anchors give mean MPJPE 45.3
        #      vs 50.2 for prior-free bootstrapping;
        #   3. prior-confidence gate: if the refinement's PRIOR-FREE cost
        #      exceeds the prior-free solve's by >prior_guard_ratio, the
        #      learned manifold contradicts the measurements (out-of-
        #      distribution behavior — e.g. the gallop-trained GMM on a
        #      "flick" trial drags MPE 225->425) and the trial falls back
        #      to the prior-free solution.
        base_cfg = kin.KinematicConfig(
            fisheye=not p.kinetic_dataset,
            robust=not p.hand_labeled_data,
            kinetic_dataset=p.kinetic_dataset,
            cam_multipliers=(1.0, 1.0, 0.6, 0.6)
            if p.kinetic_dataset else ())
        boot = kin.KinematicFTE(base_cfg, est.subject)
        # monocular heading multistart (parallel/batch.py): escapes
        # knife-edge init basins at the cost of extra (vmapped) batch
        st_free = pbatch.multistart_single(boot.make_solver(),
                                           jnp.asarray(q0), data)
        q_boot = st_free.q
        if use_gmm:
            # base-pose anchor: pin the prior-constrained solves to the
            # prior-free base trajectory (DD_BASE_ANCHOR; round-5
            # forced-vs-gated study — the GMM's damage is global depth)
            data = data._replace(base_ref=st_free.q[:, :6])
            est.data = data
            chain_cfg = dataclasses.replace(base_cfg, use_gmm=True,
                                            **DD_BASE_ANCHOR)
            chain = kin.KinematicFTE(chain_cfg, est.subject)
            st_chain = chain.make_solver()(st_free.q, data)
            c_free = float(boot._cost(st_free.q, data, 1.0))
            c_chain = float(boot._cost(st_chain.q, data, 1.0))
            if bool(prior_gate_accept(c_chain, c_free,
                                      prior_guard_ratio)):
                q_boot = st_chain.q
            else:
                prior_ok = False
        if use_ar:
            # AR motion prior on every trial (reference behavior); for
            # gate-rejected trials the anchors come from the prior-free
            # bootstrap (q_boot is st_free.q there)
            mm = armodel.train_motion_model(
                dset, window_size=motion_model_window_size,
                lasso=motion_model_sparse_solution,
                cache_dir=data_ops.prior_cache_dir(dset))
            # anchor the AR predictions on the bootstrap and shrink the
            # per-dim weights by the observed prediction error
            # (armodel.adaptive_motion_weights — empirical Bayes)
            x_boot = np.asarray(sk.relative_pose(
                np.asarray(q_boot, np.float64)))
            y_pred, valid = armodel.anchor_predictions(mm, x_boot)
            w_ad = armodel.adaptive_motion_weights(mm, y_pred, x_boot,
                                                   valid)
            data = data._replace(ar=kin.ARAnchor(
                jnp.asarray(y_pred), jnp.asarray(w_ad),
                jnp.asarray(valid)))
        q0 = np.asarray(q_boot, q0.dtype)
        est.data = data
    use_gmm = use_gmm and prior_ok

    use_shutter = p.enable_shutter_delay_estimation and scene.cam_idx is None
    cfg = kin.KinematicConfig(
        fisheye=not p.kinetic_dataset, robust=not p.hand_labeled_data,
        use_gmm=use_gmm, use_ar=use_ar,
        kinetic_dataset=p.kinetic_dataset,
        live_shutter=use_shutter,
        cam_multipliers=(1.0, 1.0, 0.6, 0.6) if p.kinetic_dataset else (),
        **(DD_BASE_ANCHOR if (use_gmm or use_ar) else {}))
    fte = kin.KinematicFTE(cfg, est.subject)
    est.fte = fte
    run = fte.make_solver()
    if scene.cam_idx is not None and not boot_ran:
        # cold monocular default solve: heading multistart (basin escape);
        # prior modes warm start from the multistarted bootstrap instead
        state = pbatch.multistart_single(run, jnp.asarray(q0), data)
    else:
        state = run(jnp.asarray(q0), data)
    if use_shutter:
        # joint (q, tau) refinement: the per-camera delays are solver
        # unknowns coupled to the trajectory through a bordered banded
        # system (Schur complement on the banded factor) — the reference's
        # free shutter_delay[C] Var (acinoset_misc.py:180-183), with the
        # exact chain rule through the live base-velocity shift
        jrun = fte.make_joint_shutter_solver()
        C = data.meas.shape[1]
        bstate = jrun(state.q, jnp.zeros(C, state.q.dtype), data)
        tau_np = np.array(bstate.tau)
        tau_np[0] = 0.0        # camera 0 is the convention anchor (soft-pinned
        #                        in the solve to ~1e-9; exact zero for output)
        data = data._replace(sd_tau=jnp.asarray(tau_np))
        state = state._replace(q=bstate.q, cost=bstate.cost,
                               it=state.it + bstate.it)
        est.shutter_delay = tau_np
        est.data = data
    if use_ar and motion_prior_rolling > 0:
        for _ in range(motion_prior_rolling):
            x_cur = np.asarray(sk.relative_pose(
                np.asarray(state.q, np.float64)))
            y_pred, valid = armodel.anchor_predictions(mm, x_cur)
            w_ad = armodel.adaptive_motion_weights(mm, y_pred, x_cur, valid)
            data = data._replace(ar=kin.ARAnchor(
                jnp.asarray(y_pred), jnp.asarray(w_ad),
                jnp.asarray(valid)))
            state = run(state.q, data)
        est.data = data
    est.q = np.asarray(state.q, dtype=np.float64)
    if (ground_anchor and scene.cam_idx is not None
            and not p.kinetic_dataset):
        # monocular ground-plane depth anchor (pipeline/depth_anchor.py):
        # analytic shift along the camera ray to close the stance-feet
        # plane gap, then a short anchored polish (same path as the
        # batched pipeline's _anchor_polish)
        from . import depth_anchor as danchor
        ci = scene.cam_idx
        qc, stw, shift = danchor.ray_depth_correction(
            est.q, est.subject, scene.fps, p.ground_plane_height,
            scene.r_arr[ci], scene.t_arr[ci])
        # zero shift = no trustworthy depth evidence: skip the polish too
        # (its stance-z pull acts on ALL stance frames including hovering
        # ones; polishing an unshifted trajectory over-corrects depth by
        # the hover bias — measured dd MPE 182 -> 232 mm on the bench set,
        # same gate as pipeline/batched._anchor_polish)
        if stw.sum() > 0 and float(np.max(np.abs(shift))) != 0.0:
            acfg = dataclasses.replace(cfg, use_gmm=False, use_ar=False,
                                       **danchor.POLISH_CFG)
            afte = kin.KinematicFTE(acfg, est.subject)
            ast = afte.make_solver(stages=danchor.POLISH_STAGES)(
                jnp.asarray(qc, state.q.dtype), data._replace(
                    ground_z=jnp.asarray(p.ground_plane_height),
                    stance_w=jnp.asarray(stw)))
            # acceptance gate (same rule as batched._anchor_polish): the
            # analytic shift is reprojection-neutral, so a polish that
            # worsens the plain prior-free objective > 5 % diverged
            # against bad stance evidence — revert
            gfte = kin.KinematicFTE(dataclasses.replace(
                cfg, use_gmm=False, use_ar=False), est.subject)
            c0 = float(gfte.objective(state.q, data))
            c1 = float(gfte.objective(ast.q, data))
            if np.isfinite(c1) and c1 <= 1.05 * c0:
                est.q = np.asarray(ast.q, np.float64)
                state = state._replace(q=ast.q)
    if (depth_scan and use_priors and prior_ok
            and scene.cam_idx is not None and not p.kinetic_dataset):
        # depth line-scan (pipeline/batched semantics): re-solve at
        # candidate depth offsets along the viewing ray, keep a candidate
        # only on a clear prior-free cost win, veto picks contradicting
        # the body-scale channel (depth_anchor.make_depth_linescan)
        from . import depth_anchor as danchor
        ci = scene.cam_idx
        rays = danchor.camera_ray(est.q, scene.r_arr[ci],
                                  scene.t_arr[ci])[None]
        veto = np.asarray([danchor.scale_median(
            est.q, est.subject, np.asarray(data.meas)[:, 0],
            np.asarray(data.weight)[:, 0], scene.k_arr[ci],
            scene.d_arr[ci], scene.r_arr[ci], scene.t_arr[ci],
            fisheye=not p.kinetic_dataset)])
        scan = danchor.make_depth_linescan(est.subject, state.q.dtype)
        bat1 = jax.tree.map(lambda x: jnp.asarray(x)[None], data)
        _, shifts = scan(jnp.asarray(est.q, state.q.dtype)[None], bat1,
                         rays, veto)
        if float(shifts[0]) != 0.0:
            # the scan JUDGES depth only (its prior-free lanes carry
            # monocular depth wobble): apply the accepted shift to the
            # solved trajectory and re-polish with the full prior solver
            # at the corrected depth (pipeline/batched.py semantics)
            q_shift = np.asarray(est.q, np.float64).copy()
            q_shift[:, :3] += float(shifts[0]) * rays[0]
            data2 = data._replace(base_ref=jnp.asarray(q_shift[:, :6]))
            if use_ar:
                x_c = np.asarray(sk.relative_pose(q_shift))
                yp2, vl2 = armodel.anchor_predictions(mm, x_c)
                data2 = data2._replace(ar=data2.ar._replace(
                    y_pred=jnp.asarray(yp2), valid=jnp.asarray(vl2)))
            st2 = run(jnp.asarray(q_shift, state.q.dtype), data2)
            est.q = np.asarray(st2.q, np.float64)
            state = state._replace(q=st2.q)
            if solver_output:
                print(f"depth line-scan shift: {float(shifts[0]):+.2f} m")
    est.opt_time_s = time.time() - t0
    est.obj_cost = float(fte.objective(state.q, data))
    ok = bool(np.isfinite(est.obj_cost)) and bool(
        np.all(np.isfinite(est.q)))
    if solver_output:
        print(f"solved in {est.opt_time_s:.1f}s, it={int(state.it)}, "
              f"cost={float(state.cost):.2f}")
    if ok and save:
        fname = "fte_kinematic" + ("_gt" if p.hand_labeled_data else "")
        if scene.cam_idx is not None:
            fname = (f"fte_kinematic_{scene.cam_idx}" if monocular_constraints
                     else f"fte_kinematic_orig_{scene.cam_idx}")
        est.save(fname, out_dir_prefix=out_dir_prefix)
    return ok


def _load_warm_start(est: CheetahEstimator, monocular: bool,
                     out_dir_prefix: Optional[str]):
    """Warm start from the saved kinematic solution
    (reference acinoset_opt.py:739-777)."""
    base = (os.path.join(out_dir_prefix, est.data_path)
            if out_dir_prefix else est.params.data_dir)
    name = ("fte_kinematic" if not monocular or est.scene.cam_idx is None
            else f"fte_kinematic_{est.scene.cam_idx}")
    path = os.path.join(base, name, "fte.pickle")
    if not os.path.exists(path) and monocular:
        path = os.path.join(base, f"fte_kinematic_orig_{est.scene.cam_idx}",
                            "fte.pickle")
    d = dio.load_fte_pickle(path)
    return d


def determine_contacts(est: CheetahEstimator, monocular: bool = False,
                       out_dir_prefix: Optional[str] = None,
                       verbose: bool = False):
    """Contact detection + GRF synthesis from the kinematic solution
    (reference acinoset_opt.py:638-690)."""
    from . import contacts as contacts_mod

    d = _load_warm_start(est, monocular, out_dir_prefix)
    est.com_vel = d["com_vel"]
    est.com_pos = d["com_pos"]
    speed = float(np.mean(np.linalg.norm(d["com_vel"], axis=1)))
    avg_vel = np.mean(d["com_vel"], axis=0)
    base = (os.path.join(out_dir_prefix, est.data_path)
            if out_dir_prefix else est.params.data_dir)
    contacts, contacts_tmp = contacts_mod.contact_detection(
        d["q"], d["dq"], est.subject, est.params.start_frame, speed,
        est.scene.fps, data_dir=base,
        ground_plane_height=est.params.ground_plane_height)
    direction = 1.0 if avg_vel[0] < 0 else -1.0
    contacts_mod.synth_grf_data(speed, direction, os.path.join(base, "grf"))
    contacts_mod.synth_grf_data(speed, direction, os.path.join(base, "grf"),
                                "autogen-contact-02.json", "data_synth_02")
    if verbose:
        print(contacts)
    return contacts, contacts_tmp


def reset_trajectory(est: CheetahEstimator, extend_by: int = 0):
    """Re-window the trial, optionally extending the frame range (reference
    reset_pyomo_model(extend_by=...), acinoset_opt.py:40-69): rebuilds the
    measurement tensors from the already-loaded DLC tables."""
    if extend_by:
        est.params.end_frame += extend_by
        est.params.total_length = est.params.end_frame \
            - est.params.start_frame
    _load_measurements(est)
    return est


def estimate_kinetics(est: CheetahEstimator,
                      joint_estimation: bool = True,
                      synthesised_grf: bool = False,
                      ground_constraint: bool = False,
                      disable_pose_prior: bool = False,
                      disable_motion_prior: bool = False,
                      use_2d_reprojections: bool = True,
                      enable_lcp: bool = False,
                      out_fname: str = "fte",
                      out_dir_prefix: Optional[str] = None,
                      solver_output: bool = False,
                      save: bool = True) -> bool:
    """Physics-based FTE (reference acinoset_opt.py:693-963): warm start from
    the kinematic solution, contacts from autogen-contact.json; torques (and,
    for joint estimation, GRFs) are eliminated per frame inside the solver."""
    import json as _json

    import jax.numpy as _jnp

    from ..solver import kinetic as kn

    p = est.params
    t0 = time.time()
    monocular = est.scene.cam_idx is not None
    d = _load_warm_start(est, monocular, out_dir_prefix)
    q_warm = jnp.asarray(d["q"])
    est.com_vel = d["com_vel"]
    est.com_pos = d["com_pos"]
    base = (os.path.join(out_dir_prefix, est.data_path)
            if out_dir_prefix else p.data_dir)
    with open(os.path.join(base, "grf", "autogen-contact.json"),
              encoding="utf-8") as f:
        cj = _json.load(f)
    N = p.end_frame - p.start_frame
    stance = kn.stance_matrix(cj["contacts"], cj["start_frame"], N)
    stance = kn.prune_stance(stance, np.asarray(q_warm), est.subject,
                             1.0 / est.scene.fps)
    if synthesised_grf:
        from . import contacts as contacts_mod
        gz, gxy = contacts_mod.get_grf_profile(
            N, base, p.data_dir, 1.0, 1.0 / est.scale_forces_by,
            kinetic_dataset=p.kinetic_dataset, synthetic_data=True)
        from ..dynamics.eom import FOOT_NAMES
        grf_fixed = np.stack([gz[n] for n in FOOT_NAMES], axis=1)
        grf_xy_fixed = np.stack([gxy[n] for n in FOOT_NAMES], axis=1)
        use_fixed = 1.0
    else:
        grf_fixed = np.zeros((N, 4))
        grf_xy_fixed = np.zeros((N, 4, 4))
        use_fixed = 0.0
    use_gmm = (not disable_pose_prior) and monocular
    data = est.data
    if not use_2d_reprojections:
        # 3D tracking mode: no reprojection term (reference
        # estimate_kinetics(use_2d_reprojections=False))
        data = data._replace(weight=jnp.zeros_like(data.weight))
    if use_gmm:
        from ..priors import dataset as ds
        df = ds.load_pose_dataset(DATA_DRIVEN_DATASET)
        gp = gmm_mod.to_solver_prior(gmm_mod.fit(
            df.iloc[:, 6:28].to_numpy(), n_components=5, seed=42,
            cache_dir=data_ops.prior_cache_dir(DATA_DRIVEN_DATASET)))
        data = data._replace(gmm=gp)
    kd = kn.KineticData(base=data, stance=_jnp.asarray(stance),
                        grf_fixed=_jnp.asarray(grf_fixed),
                        grf_xy_fixed=_jnp.asarray(grf_xy_fixed),
                        use_fixed_grf=_jnp.asarray(use_fixed),
                        q_warm=q_warm,
                        ground_z=_jnp.asarray(p.ground_plane_height))
    cfg = kn.KineticConfig(
        fisheye=not p.kinetic_dataset, robust=not p.hand_labeled_data,
        use_gmm=use_gmm, kinetic_dataset=p.kinetic_dataset,
        use_2d_reprojections=use_2d_reprojections,
        enable_lcp=enable_lcp,
        # the kinetic stage's "motion prior" is the torque + marker-
        # smoothing energy (reference acinoset_opt.py:919-920;
        # disable_motion_prior zeroes it). A tiny torque ridge survives so
        # the per-frame elimination stays nonsingular.
        torque_weight=1e-6 if disable_motion_prior else 1.0,
        smooth_weight_scale=0.0 if disable_motion_prior else 0.1,
        foot_height_bound=0.03 if p.kinetic_dataset else 0.1,
        cam_multipliers=(1.0, 1.0, 0.6, 0.6) if p.kinetic_dataset else ())
    fte = kn.KineticFTE(cfg, est.subject)
    run = fte.make_solver()
    state = run(q_warm, kd)
    est.q = np.asarray(state.q, dtype=np.float64)
    est.opt_time_s = time.time() - t0
    est.obj_cost = fte.objective(state.q, kd)
    est.fte = fte
    tau, gz_sol, gxy_sol = fte.forces(state.q, kd)
    est.tau = np.asarray(tau)
    est.grf_z = np.asarray(gz_sol)
    est.grf_xy = np.asarray(gxy_sol)
    ok = bool(np.all(np.isfinite(est.q)))
    if solver_output:
        print(f"kinetics solved in {est.opt_time_s:.1f}s, "
              f"it={int(state.it)}, cost={float(state.cost):.2f}")
    if ok and save:
        dir_name = "fte_kinetic" + ("_gt" if p.hand_labeled_data else "")
        if monocular:
            dir_name = f"{dir_name}_{est.scene.cam_idx}"
        est.save(dir_name, fname=out_fname, out_dir_prefix=out_dir_prefix)
    return ok


def estimate_static_grf(est: CheetahEstimator, monocular: bool = False,
                        out_dir_prefix: Optional[str] = None):
    """Per-frame static GRF solve on a saved kinematic solution
    (reference CheetahEstimator.estimate_grf, acinoset_opt.py:176-270)."""
    import json as _json

    import jax.numpy as _jnp

    from ..solver import kinetic as kn
    from ..solver.static_grf import estimate_static_grf as _solve

    d = _load_warm_start(est, monocular, out_dir_prefix)
    base = (os.path.join(out_dir_prefix, est.data_path)
            if out_dir_prefix else est.params.data_dir)
    with open(os.path.join(base, "grf", "autogen-contact.json"),
              encoding="utf-8") as f:
        cj = _json.load(f)
    N = d["q"].shape[0]
    stance = kn.stance_matrix(cj["contacts"], cj["start_frame"], N)
    stance = kn.prune_stance(stance, np.asarray(d["q"]), est.subject,
                             1.0 / est.scene.fps)
    gz, gxy = _solve(_jnp.asarray(d["q"]), _jnp.asarray(d["dq"]),
                     _jnp.asarray(d["ddq"]), _jnp.asarray(stance),
                     est.subject)
    return np.asarray(gz), np.asarray(gxy)


def estimate_grf(est: CheetahEstimator, out_dir_prefix: Optional[str] = None,
                 solver_output: bool = False, save: bool = True) -> bool:
    """GRF re-estimation with torques anchored to the previous kinetic
    solution (reference estimate_grf, acinoset_opt.py:966-1048: torques
    bounded within 10%, zero GRF out of stance, foot-height box 0.03 m)."""
    import json as _json

    import jax.numpy as _jnp

    from ..dynamics.eom import TORQUE_MAP
    from ..solver import kinetic as kn

    p = est.params
    t0 = time.time()
    base = (os.path.join(out_dir_prefix, est.data_path)
            if out_dir_prefix else p.data_dir)
    prev = dio.load_fte_pickle(os.path.join(base, "fte_kinetic",
                                            "fte.pickle"))
    q_warm = jnp.asarray(prev["q"])
    # previous torques as the anchor
    N = prev["q"].shape[0]
    tau_prev = np.zeros((N, len(TORQUE_MAP.names)))
    col = 0
    for name in TORQUE_MAP.names:
        motor = name.rsplit(":", 1)[0]
        if motor in prev["tau"]:
            idx = [n for n in TORQUE_MAP.names
                   if n.startswith(motor + ":")].index(name)
            tau_prev[:, col] = prev["tau"][motor][:, idx]
        col += 1
    with open(os.path.join(base, "grf", "autogen-contact.json"),
              encoding="utf-8") as f:
        cj = _json.load(f)
    stance = kn.stance_matrix(cj["contacts"], cj["start_frame"], N)
    stance = kn.prune_stance(stance, np.asarray(q_warm), est.subject,
                             1.0 / est.scene.fps)
    # anchor weight ~ (10% of typical torque)^-2
    scale = max(float(np.abs(tau_prev).mean()), 1e-2)
    anchor_w = 1.0 / (0.1 * scale)**2
    kd = kn.KineticData(base=est.data, stance=_jnp.asarray(stance),
                        grf_fixed=_jnp.zeros((N, 4)),
                        grf_xy_fixed=_jnp.zeros((N, 4, 4)),
                        use_fixed_grf=_jnp.asarray(0.0), q_warm=q_warm,
                        tau_anchor=_jnp.asarray(tau_prev),
                        tau_anchor_weight=_jnp.asarray(anchor_w),
                        ground_z=_jnp.asarray(p.ground_plane_height))
    cfg = kn.KineticConfig(
        fisheye=not p.kinetic_dataset, robust=not p.hand_labeled_data,
        kinetic_dataset=p.kinetic_dataset, foot_height_bound=0.03,
        cam_multipliers=(1.0, 1.0, 0.6, 0.6) if p.kinetic_dataset else ())
    fte = kn.KineticFTE(cfg, est.subject)
    state = fte.make_solver()(q_warm, kd)
    est.q = np.asarray(state.q, dtype=np.float64)
    est.opt_time_s = time.time() - t0
    est.obj_cost = fte.objective(state.q, kd)
    tau, gz, gxy = fte.forces(state.q, kd)
    est.tau = np.asarray(tau)
    est.grf_z = np.asarray(gz)
    est.grf_xy = np.asarray(gxy)
    ok = bool(np.all(np.isfinite(est.q)))
    if solver_output:
        print(f"grf re-estimation in {est.opt_time_s:.1f}s, "
              f"cost={float(state.cost):.2f}")
    if ok and save:
        est.save("fte_grf", fname="fte", out_dir_prefix=out_dir_prefix)
    return ok
