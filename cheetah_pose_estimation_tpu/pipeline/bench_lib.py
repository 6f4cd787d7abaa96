"""Shared benchmark/problem-building helpers for bench.py and graft entry.

Builds the batched monocular default-mode reconstruction problem over the 10
AcinoSet test trials (ground-truth q trajectories from the reference's shipped
fte.pickle artifacts, synthetic 6-camera scenes and DLC-like detections, since
the raw inputs are not distributed with the reference)."""
from __future__ import annotations

import glob
import os
import pickle
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import synthetic as syn
from ..models import noise as noise_tables
from ..models import params as P
from ..models import skeleton as sk
from ..parallel import batch as pbatch
from ..pipeline import initialization as init
from ..solver import kinematic as kin
from ..utils import data_ops
from ..utils.device import host_cpu

REF_TEST_SET = "/root/reference/data/test_set"


def _fps_for(path: str) -> float:
    if "2019" in path:
        return 120.0
    if "2017" in path:
        return 90.0
    return 200.0


def _subject_for(path: str) -> str:
    for name in ("jules", "phantom", "shiraz", "arabia"):
        if name in path:
            return name
    return "acinoset"


def load_reference_trajectories(max_trials: Optional[int] = None,
                                include_kinetic: bool = False):
    """(q, subject_name, fps) tuples from shipped fte.pickle files; prefers
    the physics-based solutions (fte_kinetic_* — dynamically consistent, so
    they are valid GT for the physics stage too); falls back to procedural
    gallops when the reference tree is unavailable."""
    out = []
    pats = sorted(glob.glob(os.path.join(
        REF_TEST_SET, "*", "**", "fte_kinematic", "fte.pickle"),
        recursive=True))
    for p in pats:
        if not include_kinetic and "kinetic_dataset" in p:
            continue
        kin_p = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(p)), "fte_kinetic_*",
            "fte.pickle")))
        if os.environ.get("CHEETAH_GT_KINEMATIC") == "1":
            kin_p = []     # debug/ablation: force the multi-view kinematic GT
        with open(kin_p[0] if kin_p else p, "rb") as f:
            q = pickle.load(f)["q"]
        out.append((np.asarray(q), _subject_for(p), _fps_for(p)))
    if not out:
        for i in range(10):
            out.append((syn.gallop_trajectory(40 + 2 * i, seed=i),
                        "acinoset", 120.0))
    if max_trials:
        out = out[:max_trials]
    return out


def reference_trial_paths(max_trials: Optional[int] = None):
    """Trial directory names (relative to the reference test set) in the SAME
    order as load_reference_trajectories — lets studies label per-trial rows
    with the behavior-bearing trial names (e.g. .../flick2)."""
    out = []
    pats = sorted(glob.glob(os.path.join(
        REF_TEST_SET, "*", "**", "fte_kinematic", "fte.pickle"),
        recursive=True))
    for p in pats:
        if "kinetic_dataset" in p:
            continue
        out.append(os.path.relpath(os.path.dirname(os.path.dirname(p)),
                                   REF_TEST_SET))
    if not out:
        out = [f"synthetic_gallop_{i}" for i in range(10)]
    if max_trials:
        out = out[:max_trials]
    return out


def score_per_trial(qs_batch: np.ndarray, trials, fpss, subject):
    """Per-trial (MPE mm, MPJPE mm, CoM-vel RMSE m/s) vs the synthetic GT.

    The three quality metrics of the reference's dataset_post_process
    (run_dataset.py:365-562) on bench problems; qs_batch is (B, Npad, 54)."""
    rows = []
    with host_cpu():
        for i, tr in enumerate(trials):
            n = tr.q_gt.shape[0]
            rec = np.asarray(sk.fk_markers(
                np.asarray(qs_batch[i, :n], np.float64), subject))
            err = rec - tr.markers_gt
            mpe = float(np.mean(np.linalg.norm(err, axis=2)) * 1e3)
            errr = (rec - rec.mean(axis=1, keepdims=True)) \
                - (tr.markers_gt - tr.markers_gt.mean(axis=1, keepdims=True))
            mpjpe = float(np.mean(np.linalg.norm(errr, axis=2)) * 1e3)
            cv_r = np.diff(np.asarray(sk.com_position(
                np.asarray(qs_batch[i, :n], np.float64), subject)),
                axis=0) * fpss[i]
            cv_g = np.diff(np.asarray(sk.com_position(tr.q_gt, subject)),
                           axis=0) * fpss[i]
            cvr = float(np.sqrt(np.mean(np.sum((cv_r - cv_g) ** 2, axis=1))))
            rows.append((mpe, mpjpe, cvr))
    return rows


def make_anchor_polish(subject, dtype=jnp.float32):
    """Monocular ground-plane depth anchor on bench problems: analytic ray
    shift + short anchored polish + acceptance gate — the exact
    pipeline.batched._anchor_polish semantics, shared by bench.py and the
    forced-vs-gated study so their dd numbers are production-comparable.

    Returns run(qs, batched, trials, fpss, gphs) -> (B, Npad, 54) jnp."""
    import dataclasses as _dc

    from . import depth_anchor as danchor
    cfg = kin.KinematicConfig(fisheye=True, robust=True)
    afte = kin.KinematicFTE(_dc.replace(cfg, **danchor.POLISH_CFG), subject)
    vpol = jax.jit(jax.vmap(afte.make_solver(stages=danchor.POLISH_STAGES)))
    gate = kin.KinematicFTE(cfg, subject)
    vobj = jax.jit(jax.vmap(gate.objective))

    def run(qs_in, batched, trials, fpss, gphs):
        qs_np = np.asarray(qs_in, np.float64)
        B, n_frames = qs_np.shape[0], qs_np.shape[1]
        stance_b = np.zeros((B, n_frames, 4))
        qs_corr = qs_np.copy()
        with host_cpu():
            for i, tr in enumerate(trials):
                n = tr.q_gt.shape[0]
                cam = jax.tree.map(lambda x: np.asarray(x)[i], batched.cam)
                qc, stw, shift = danchor.ray_depth_correction(
                    qs_np[i, :n], subject, fpss[i], gphs[i],
                    cam.R[0], cam.t[0])
                if float(np.max(np.abs(shift))) == 0.0:
                    continue    # no depth evidence: no shift AND no polish
                qs_corr[i, :n] = qc
                stance_b[i, :n] = stw
        if stance_b.sum() == 0.0:
            return jnp.asarray(qs_np, dtype)
        stp = vpol(jnp.asarray(qs_corr, dtype),
                   batched._replace(ground_z=jnp.asarray(gphs, dtype),
                                    stance_w=jnp.asarray(stance_b, dtype)))
        c0 = np.asarray(vobj(jnp.asarray(qs_np, dtype), batched), np.float64)
        c1 = np.asarray(vobj(stp.q, batched), np.float64)
        accept = np.isfinite(c1) & (c1 <= 1.05 * c0)
        return jnp.where(jnp.asarray(accept)[:, None, None],
                         stp.q, jnp.asarray(qs_np, dtype))

    return run


def empty_priors(N: int):
    gmmp = kin.GMMPrior(np.zeros((1, 22)), np.eye(22)[None], np.zeros((1,)))
    ar = kin.ARAnchor(np.zeros((N, 28)), np.zeros(28), np.zeros(N))
    return gmmp, ar


def build_dryrun_problems(n: int, n_frames: int = 64):
    """n production-shape problems for the multichip dry run: per trial a
    6-camera multi-view KinematicData, a monocular priors-ON (GMM + AR)
    KinematicData, and the shared q0 — real reference trajectories at the
    production trial length (64 frames, SURVEY §6)."""
    trajs = load_reference_trajectories()
    gp = None
    mm = None
    try:
        from ..priors import armodel, dataset as prior_ds, gmm as gmm_mod
        from . import estimator as est_mod
        dset = est_mod.DATA_DRIVEN_DATASET
        df = prior_ds.load_pose_dataset(dset)
        gp = gmm_mod.to_solver_prior(gmm_mod.fit(
            df.iloc[:, 6:28].to_numpy(), n_components=5, seed=42,
            cache_dir=data_ops.prior_cache_dir(dset)))
        mm = armodel.train_motion_model(
            dset, window_size=4, lasso=True,
            cache_dir=data_ops.prior_cache_dir(dset))
    except Exception:
        pass  # hermetic fallback below

    datas_mv, datas_mono, q0s = [], [], []
    with host_cpu():
        for i in range(n):
            q_gt, name, fps = trajs[i % len(trajs)]
            if q_gt.shape[0] < n_frames:
                reps = -(-n_frames // q_gt.shape[0])
                q_gt = np.concatenate([q_gt] * reps)[:n_frames]
            q_gt = q_gt[:n_frames]
            d, q0, _ = build_monocular_problem(q_gt, "acinoset", fps,
                                               seed=i, cam_idx=2)
            mono = d
            if gp is not None:
                x_init = np.asarray(sk.relative_pose(q0))
                from ..priors import armodel
                y_pred, valid = armodel.anchor_predictions(mm, x_init)
                mono = mono._replace(
                    gmm=gp, ar=kin.ARAnchor(y_pred,
                                            armodel.motion_weights(mm),
                                            valid))
            else:
                # reference data unavailable: a 5-component prior around the
                # init poses + a weak AR anchor keep the prior code paths hot
                x_init = np.asarray(sk.relative_pose(q0))
                gmmp = kin.GMMPrior(
                    np.tile(x_init[:1, 6:28], (5, 1))
                    + 0.01 * np.arange(5)[:, None],
                    np.tile(np.eye(22)[None], (5, 1, 1)),
                    np.full((5,), -np.log(5.0)))
                mono = mono._replace(
                    gmm=gmmp, ar=kin.ARAnchor(x_init, np.full(28, 1e-3),
                                              np.ones(len(x_init))))
            datas_mono.append(mono)
            q0s.append(q0)
            # multi-view variant: same trial, all 6 cameras, no priors
            d_mv, _, _ = build_monocular_problem(q_gt, "acinoset", fps,
                                                 seed=i, cam_idx=None)
            datas_mv.append(d_mv)
    return datas_mv, datas_mono, q0s


def build_monocular_problem(q_gt: np.ndarray, subject_name: str, fps: float,
                            cam_idx: Optional[int] = 2, seed: int = 0,
                            n_cams: int = 6,
                            noise_px: float = 1.5,
                            occlusion_rate: float = 0.0,
                            confusion_rate: float = 0.0
                            ) -> Tuple[kin.KinematicData,
                                       np.ndarray,
                                       syn.SyntheticTrial]:
    # Problem construction is host work: on a tunneled accelerator backend
    # the many distinct-shape scrap ops here would each pay a compile
    # round-trip (~0.4 s), so pin them to the host CPU.
    with host_cpu():
        subject = P.get_subject(subject_name)
        markers = np.asarray(sk.fk_markers(q_gt, subject))
        scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=n_cams,
                                 fps=fps, seed=seed)
        trial = syn.synthesize(q_gt, subject, scene, noise_px=noise_px,
                               outlier_frac=0.02, seed=seed,
                               subject_name=subject_name,
                               occlusion_rate=occlusion_rate,
                               confusion_rate=confusion_rate)
        w = syn.gated_weights(trial)
        q0 = init.initialize_trajectory(trial.meas, w, scene.K, scene.D,
                                        scene.R, scene.t, subject,
                                        fisheye=True, cam_idx=cam_idx)
    N = q_gt.shape[0]
    gmmp, ar = empty_priors(N)
    sl = (slice(None) if cam_idx is None
          else slice(cam_idx, cam_idx + 1))
    data = kin.KinematicData(
        meas=trial.meas[:, sl],
        weight=w[:, sl],
        cam=kin.CameraSet(scene.K[sl], scene.D[sl],
                          scene.R[sl], scene.t[sl]),
        h=np.asarray(1.0 / fps),
        acc_weight=noise_tables.acc_model_weights(),
        frame_valid=np.ones(N), gmm=gmmp, ar=ar)
    return data, q0, trial


def build_batch(max_trials: Optional[int] = None, n_frames: Optional[int] = None,
                dtype=jnp.float32, repeat_to: Optional[int] = None):
    """Batched monocular default problem over the test trials.

    Returns (batched_data, q0_batch, trials, subject) — one shared subject
    (the flagship generic 'acinoset' morphology is used for all so a single
    compiled solver serves the batch; per-subject batching is a config away).
    """
    trajs = load_reference_trajectories(max_trials)
    if repeat_to:
        k = 0
        while len(trajs) < repeat_to:
            q, s, f = trajs[k % len(trajs)]
            trajs.append((q, s, f))
            k += 1
    subject = P.get_subject("acinoset")
    datas, q0s, trials = [], [], []
    for i, (q_gt, name, fps) in enumerate(trajs):
        # re-express every trajectory with the shared generic morphology so
        # the batch shares one compiled FK; marker GT is re-rendered with it
        d, q0, tr = build_monocular_problem(q_gt, "acinoset", fps, seed=i)
        datas.append(d)
        q0s.append(q0)
        trials.append(tr)
    batched, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames,
                                        dtype=dtype)
    return batched, q0b, trials, subject


def build_physics_batch(datas, qs_default, fpss, subject,
                        n_frames: Optional[int] = None, dtype=jnp.float32,
                        use_gmm: bool = True,
                        ground_heights: Optional[List[float]] = None):
    """Batched physics-based problems warm-started from solved kinematic
    trajectories: host-side contact detection per trial -> stance schedules
    -> one stacked KineticData (joint torque/GRF estimation mode).

    ``ground_heights`` (len B): per-trial ground plane elevation (the
    reference's metadata ground_plane_height — AcinoSet world frames do not
    have the ground at z=0). Defaults to 0 for all trials."""
    from ..priors import dataset as prior_ds, gmm as gmm_mod
    from ..solver import kinetic as kn
    from . import contacts as contacts_mod
    from . import estimator as est_mod

    # All prep stays on the host CPU: on a tunneled accelerator backend each
    # distinct-shape scrap op costs a ~0.4 s compile round-trip, and there
    # are hundreds of them across the per-trial loop (the jitted solve
    # transfers the one stacked batch to the device at call time anyway).
    with host_cpu():
        gp = None
        if use_gmm:
            try:
                df = prior_ds.load_pose_dataset(est_mod.DATA_DRIVEN_DATASET)
                gp = gmm_mod.to_solver_prior(gmm_mod.fit(
                    df.iloc[:, 6:28].to_numpy(), n_components=5, seed=42,
                    cache_dir=data_ops.prior_cache_dir(
                        est_mod.DATA_DRIVEN_DATASET)))
            except (OSError, ValueError):
                gp = None
        # one padded FK call for every trial's foot kinematics and CoM (a
        # per-trial call would recompile for each distinct trial length)
        B = len(qs_default)
        Nmax = max(np.asarray(q).shape[0] for q in qs_default)
        qp = np.zeros((B, Nmax, qs_default[0].shape[1]))
        dqp = np.zeros_like(qp)
        for i, (q, fps) in enumerate(zip(qs_default, fpss)):
            q = np.asarray(q, np.float64)
            qp[i, : q.shape[0]] = q
            dqp[i, 1: q.shape[0]] = (q[1:] - q[:-1]) * fps
        h_all, v_all = contacts_mod.foot_kinematics(
            qp.reshape(-1, qp.shape[-1]), dqp.reshape(-1, qp.shape[-1]),
            subject)
        h_all = h_all.reshape(B, Nmax, -1)
        v_all = v_all.reshape(B, Nmax, h_all.shape[-1], 3)
        com_all = np.asarray(sk.com_position(
            qp.reshape(-1, qp.shape[-1]), subject)).reshape(B, Nmax, 3)

        kds, qws = [], []
        for i, (d, q, fps) in enumerate(zip(datas, qs_default, fpss)):
            q = np.asarray(q, np.float64)
            N = q.shape[0]
            h = 1.0 / fps
            gph = float(ground_heights[i]) if ground_heights is not None \
                else 0.0
            dq = np.zeros_like(q)
            dq[1:] = (q[1:] - q[:-1]) / h
            com_vel = (com_all[i, 1:N] - com_all[i, :N - 1]) * fps
            speed = float(np.mean(np.linalg.norm(com_vel, axis=1)))
            contacts, _ = contacts_mod.contact_detection(
                q, dq, subject, 0, speed, fps,
                ground_plane_height=gph,
                foot_kin=(h_all[i, :N], v_all[i, :N]))
            stance = kn.stance_matrix(contacts, 0, N)
            stance = kn.prune_stance(
                stance, q, subject, h,
                foot_speed=np.linalg.norm(v_all[i, :N, :, :2], axis=-1))
            base = d._replace(gmm=gp) if gp is not None else d
            kds.append(kn.KineticData(
                base=base, stance=jnp.asarray(stance),
                grf_fixed=jnp.zeros((N, 4)),
                grf_xy_fixed=jnp.zeros((N, 4, 4)),
                use_fixed_grf=jnp.asarray(0.0), q_warm=jnp.asarray(q),
                ground_z=jnp.asarray(gph)))
            qws.append(q)
        return pbatch.pad_and_stack_kinetic(kds, qws, n_frames=n_frames,
                                            dtype=dtype)
