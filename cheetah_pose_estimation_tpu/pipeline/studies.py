"""Hyper-parameter grid search and ablation studies.

Port of the reference's study drivers (``run_dataset.py:635-915``): sweep GMM
component counts x AR window sizes x L1/L2 regression for the data-driven
mode, and prior on/off ablations — each configuration re-solves the monocular
trials and aggregates MPE/MPJPE against the multi-view solution. On TPU the
sweep axis is just more batch.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..data import io as dio
from . import estimator as est_mod
from . import metrics as metrics_mod


def _score_against_multiview(dir_prefix: str, data_path: str, sub: str
                             ) -> Optional[Tuple[float, float, float]]:
    """(MPE mm, MPJPE mm, CoM-vel RMSE m/s) of ``sub`` vs the multi-view
    solve."""
    base = os.path.join(dir_prefix, data_path)
    gt_p = os.path.join(base, "fte_kinematic", "fte.pickle")
    p = os.path.join(base, sub, "fte.pickle")
    if not (os.path.exists(gt_p) and os.path.exists(p)):
        return None
    gtd = dio.load_fte_pickle(gt_p)
    d = dio.load_fte_pickle(p)
    gt, pos = gtd["positions"], d["positions"]
    n = min(len(gt), len(pos))
    mpe_tbl, _, _ = metrics_mod.traj_error(gt[:n].copy(), pos[:n].copy(),
                                           verbose=False)
    mpjpe_tbl, _, _ = metrics_mod.traj_error(gt[:n].copy(), pos[:n].copy(),
                                             centered=True, verbose=False)
    cvr = metrics_mod.rmse(np.asarray(gtd["com_vel"])[:n - 1],
                           np.asarray(d["com_vel"])[:n - 1])
    return (float(mpe_tbl.mean().iloc[0]),
            float(mpjpe_tbl.mean().iloc[0]), float(cvr))


def _pad_gmm(gp, k_max: int):
    """Pad a GMMPrior to k_max components with -inf-weight dummies so every
    grid configuration shares one compiled solver shape."""
    import numpy as _np

    from ..solver import kinematic as kin
    K = gp.means.shape[0]
    if K == k_max:
        return gp
    pad = k_max - K
    return kin.GMMPrior(
        means=_np.concatenate([_np.asarray(gp.means),
                               _np.zeros((pad, gp.means.shape[1]))]),
        prec=_np.concatenate([_np.asarray(gp.prec),
                              _np.tile(_np.eye(gp.prec.shape[1]),
                                       (pad, 1, 1))]),
        log_norm=_np.concatenate([_np.asarray(gp.log_norm),
                                  _np.full((pad,), -1e30)]))


def run_grid_search_batched(root_dir: str, dir_prefix: str, test_set: Tuple,
                            pose_components: Tuple[int, ...] = (3, 5, 8),
                            windows: Tuple[int, ...] = (2, 4, 6, 10),
                            lasso_options: Tuple[bool, ...] = (True, False),
                            cam_overrides: Optional[List[int]] = None,
                            max_trials: Optional[int] = None,
                            data_driven_dataset: Optional[str] = None,
                            dtype=None, mesh=None,
                            verbose: bool = True) -> pd.DataFrame:
    """The full GMM-components x AR-window x L1/L2 sweep as ONE vmapped
    solve: the (config x trial) product is the batch axis ("the sweep axis is
    just more batch"). GMM priors with different component counts are padded
    to a common K (log-weight -inf dummies), so a single compiled kinematic
    solver serves every configuration. Scores each solution against the
    saved multi-view fte_kinematic positions; writes the same
    ``grid_search_results.csv`` schema as the serial driver."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from ..models import params as params_mod
    from ..models import skeleton as sk
    from ..parallel import batch as pbatch
    from ..priors import armodel, dataset as prior_ds, gmm as gmm_mod
    from ..solver import kinematic as kin
    from ..utils import data_ops
    from . import batched as batched_mod

    t0 = _time.time()
    if dtype is None:
        dtype = jnp.float32
    trials = test_set[:max_trials] if max_trials else test_set
    dset = data_driven_dataset or est_mod.DATA_DRIVEN_DATASET
    configs = [(n, w, l) for n in pose_components for w in windows
               for l in lasso_options]
    k_max = max(pose_components)

    # prepare each trial once (measurements + init), grouped by subject
    from collections import defaultdict
    groups = defaultdict(list)
    for idx, (cheetah, date, name) in enumerate(trials):
        data_path = os.path.join(date, cheetah, name)
        if not os.path.isdir(os.path.join(root_dir, data_path)):
            continue
        cam = cam_overrides[idx] if cam_overrides else None
        est = batched_mod._prepare(root_dir, data_path, cheetah, cam,
                                   monocular=True)
        groups[params_mod.get_subject(cheetah).name].append(
            (data_path, est))

    rows_acc: Dict[Tuple, Dict[str, List[float]]] = {
        c: dict(mpe=[], mpjpe=[]) for c in configs}
    # per-config model-fit statistics (the reference's grid search records
    # these alongside the reconstruction errors, run_dataset.py:817-826 —
    # they expose model-level pathologies the mpe/mpjpe columns can't, e.g.
    # group-lasso zeroing every lag beyond 4 makes windows 6 and 10
    # byte-identical, VERDICT r4 Weak #5)
    model_stats: Dict[Tuple, Dict[str, float]] = {}
    for subject_name, ests in groups.items():
        subject = params_mod.get_subject(subject_name)
        # one production bootstrap chain per trial group (prior-free solve
        # -> 5-component GMM refinement, gated per trial — see
        # estimator.estimate_kinematics): its solutions anchor the AR
        # prior for every configuration. The sweep varies the priors of
        # the FINAL solve; a shared bootstrap keeps the anchors
        # comparable across configurations.
        gp_boot = gmm_mod.to_solver_prior(gmm_mod.fit(
            prior_ds.load_pose_dataset(dset).iloc[:, 6:28].to_numpy(),
            n_components=5, seed=42,
            cache_dir=data_ops.prior_cache_dir(dset)))
        boot_datas = [est.data._replace(gmm=gp_boot) for _, est in ests]
        boot_q0s = [est.q0 for _, est in ests]
        nfb = int(np.ceil(max(d.meas.shape[0]
                              for d in boot_datas) / 16) * 16)
        bbat, bq0 = pbatch.pad_and_stack(boot_datas, boot_q0s, n_frames=nfb,
                                         dtype=dtype)
        free = kin.KinematicFTE(
            kin.KinematicConfig(fisheye=True, robust=True), subject)
        # the same demand-driven heading multistart the production
        # data-driven mode uses (batched.run_monocular_batched): without it
        # the bootstrap can land in a trapped heading basin and every grid
        # configuration inherits the bad anchor, making the whole sweep
        # incomparable to the pipeline's quality
        st_free = pbatch.make_kinematic_multistart(free)(bq0, bbat)
        chain = kin.KinematicFTE(
            kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True),
            subject)
        st_chain = jax.jit(jax.vmap(chain.make_solver()))(st_free.q, bbat)
        vcost = jax.jit(jax.vmap(lambda q, d: free._cost(q, d, 1.0)))
        c_free = np.asarray(vcost(st_free.q, bbat), np.float64)
        c_chain = np.asarray(vcost(st_chain.q, bbat), np.float64)
        prior_ok = jnp.asarray(est_mod.prior_gate_accept(
            c_chain, c_free))[:, None, None]
        qb_np = np.asarray(jnp.where(prior_ok, st_chain.q, st_free.q),
                           np.float64)
        x_boots = [np.asarray(sk.relative_pose(qb_np[i]))
                   for i in range(len(ests))]
        datas, q0s, metasets = [], [], []
        for (n_comp, w, lasso) in configs:
            gparams = gmm_mod.fit(
                prior_ds.load_pose_dataset(dset).iloc[:, 6:28].to_numpy(),
                n_components=n_comp, seed=42,
                cache_dir=data_ops.prior_cache_dir(dset))
            gp = _pad_gmm(gmm_mod.to_solver_prior(gparams), k_max)
            mm = armodel.train_motion_model(
                dset, window_size=w, lasso=lasso,
                cache_dir=data_ops.prior_cache_dir(dset))
            if (n_comp, w, lasso) not in model_stats:
                X_tr = prior_ds.load_pose_dataset(dset) \
                    .iloc[:, 6:28].to_numpy()
                vpath = os.path.join(os.path.dirname(dset),
                                     "validation_dataset.h5")
                try:
                    Xv = prior_ds.load_pose_dataset(vpath) \
                        .iloc[:, 6:28].to_numpy()
                    gval = gmm_mod.score(gparams, Xv)
                except (OSError, ValueError):
                    gval = np.nan
                model_stats[(n_comp, w, lasso)] = dict(
                    lr_non_zeros=mm.model_non_zeros,
                    lr_train_rmse=mm.train_rmse,
                    lr_validation_rmse=mm.validation_rmse,
                    gmm_train_likelihood=gmm_mod.score(gparams, X_tr),
                    gmm_validation_likelihood=gval)
            for i, (data_path, est) in enumerate(ests):
                n = est.data.meas.shape[0]
                y_pred, valid = armodel.anchor_predictions(
                    mm, x_boots[i][:n])
                w_ad = armodel.adaptive_motion_weights(
                    mm, y_pred, x_boots[i][:n], valid)
                datas.append(est.data._replace(
                    gmm=gp,
                    ar=kin.ARAnchor(jnp.asarray(y_pred),
                                    jnp.asarray(w_ad),
                                    jnp.asarray(valid))))
                q0s.append(qb_np[i, :n])
                metasets.append(((n_comp, w, lasso), data_path, est))
        n_frames = int(np.ceil(max(d.meas.shape[0]
                                   for d in datas) / 16) * 16)
        batched, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames,
                                            dtype=dtype)
        if mesh is not None:
            batched = pbatch.shard_batch(batched, mesh)
            q0b = jax.device_put(q0b)
        fte = kin.KinematicFTE(
            kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True,
                                use_ar=True), subject)
        # config x trial lanes saturate the chip (240 at the default grid)
        # -> scan beats CR there (parallel.batch.backend_for)
        run = fte.make_solver(
            linear_solver=pbatch.backend_for(q0b.shape[0]))
        state = jax.jit(jax.vmap(run))(q0b, batched)
        qs = np.asarray(state.q, np.float64)
        for i, (cfg_key, data_path, est) in enumerate(metasets):
            gt_p = os.path.join(dir_prefix, data_path, "fte_kinematic",
                                "fte.pickle")
            if not os.path.exists(gt_p):
                continue
            gt = dio.load_fte_pickle(gt_p)["positions"]
            n = min(est.data.meas.shape[0], len(gt))
            pos = np.asarray(sk.fk_markers(qs[i, :n], subject))
            mpe_tbl, _, _ = metrics_mod.traj_error(
                np.asarray(gt)[:n].copy(), pos.copy(), verbose=False)
            mpjpe_tbl, _, _ = metrics_mod.traj_error(
                np.asarray(gt)[:n].copy(), pos.copy(), centered=True,
                verbose=False)
            rows_acc[cfg_key]["mpe"].append(float(mpe_tbl.mean().iloc[0]))
            rows_acc[cfg_key]["mpjpe"].append(
                float(mpjpe_tbl.mean().iloc[0]))

    rows = [dict(n_components=n, window=w, lasso=l,
                 mpe=np.mean(v["mpe"]) if v["mpe"] else np.nan,
                 mpjpe=np.mean(v["mpjpe"]) if v["mpjpe"] else np.nan,
                 n=len(v["mpe"]),
                 **model_stats.get((n, w, l), {}))
            for (n, w, l), v in rows_acc.items()]
    df = pd.DataFrame(rows)
    os.makedirs(dir_prefix, exist_ok=True)
    df.to_csv(os.path.join(dir_prefix, "grid_search_results.csv"),
              index=False)
    if verbose:
        print(f"[batched] grid search: {len(configs)} configs x "
              f"{sum(len(v) for v in groups.values())} trials in "
              f"{_time.time() - t0:.1f}s")
    return df


def run_grid_search(root_dir: str, dir_prefix: str, test_set: Tuple,
                    pose_components: Tuple[int, ...] = (3, 5, 8),
                    windows: Tuple[int, ...] = (2, 4, 6, 10),
                    lasso_options: Tuple[bool, ...] = (True, False),
                    cam_overrides: Optional[List[int]] = None,
                    max_trials: Optional[int] = None) -> pd.DataFrame:
    """GMM-components x AR-window x L1/L2 sweep over the data-driven mode
    (reference run_dataset.py:813-915), one serial solve per (config, trial);
    prefer :func:`run_grid_search_batched` ("the sweep axis is just more
    batch") unless debugging a single configuration."""
    rows = []
    trials = test_set[:max_trials] if max_trials else test_set
    for n_comp in pose_components:
        for w in windows:
            for lasso in lasso_options:
                mpes, mpjpes = [], []
                for idx, (cheetah, date, name) in enumerate(trials):
                    data_path = os.path.join(date, cheetah, name)
                    if not os.path.isdir(os.path.join(root_dir, data_path)):
                        continue
                    cam = (cam_overrides[idx] if cam_overrides else None)
                    est = est_mod.init_trajectory(
                        root_dir, data_path, cheetah, monocular_enable=True,
                        override_monocular_cam=cam, kinematic_model=True)
                    ok = est_mod.estimate_kinematics(
                        est, monocular_constraints=True,
                        pose_model_num_components=n_comp,
                        motion_model_window_size=w,
                        motion_model_sparse_solution=lasso,
                        out_dir_prefix=dir_prefix)
                    if not ok:
                        continue
                    cam_idx = est.scene.cam_idx
                    s = _score_against_multiview(
                        dir_prefix, data_path, f"fte_kinematic_{cam_idx}")
                    if s:
                        mpes.append(s[0])
                        mpjpes.append(s[1])
                rows.append(dict(n_components=n_comp, window=w, lasso=lasso,
                                 mpe=np.mean(mpes) if mpes else np.nan,
                                 mpjpe=np.mean(mpjpes) if mpjpes else np.nan,
                                 n=len(mpes)))
    df = pd.DataFrame(rows)
    os.makedirs(dir_prefix, exist_ok=True)
    df.to_csv(os.path.join(dir_prefix, "grid_search_results.csv"),
              index=False)
    return df


def run_data_driven_ablation_study(root_dir: str, dir_prefix: str,
                                   test_set: Tuple,
                                   cam_overrides: Optional[List[int]] = None,
                                   max_trials: Optional[int] = None
                                   ) -> pd.DataFrame:
    """Pose/motion prior on-off ablation (reference run_dataset.py:635-810)."""
    configs = [("both", False, False), ("no-pose", True, False),
               ("no-motion", False, True), ("neither", True, True)]
    rows = []
    trials = test_set[:max_trials] if max_trials else test_set
    for label, no_pose, no_motion in configs:
        mpes, mpjpes, cvrs = [], [], []
        for idx, (cheetah, date, name) in enumerate(trials):
            data_path = os.path.join(date, cheetah, name)
            if not os.path.isdir(os.path.join(root_dir, data_path)):
                continue
            cam = cam_overrides[idx] if cam_overrides else None
            est = est_mod.init_trajectory(
                root_dir, data_path, cheetah, monocular_enable=True,
                override_monocular_cam=cam, kinematic_model=True)
            ok = est_mod.estimate_kinematics(
                est, monocular_constraints=True,
                disable_pose_prior=no_pose, disable_motion_prior=no_motion,
                out_dir_prefix=dir_prefix)
            if not ok:
                continue
            s = _score_against_multiview(
                dir_prefix, data_path, f"fte_kinematic_{est.scene.cam_idx}")
            if s:
                mpes.append(s[0])
                mpjpes.append(s[1])
                cvrs.append(s[2])
        rows.append(dict(config=label,
                         mpe=np.mean(mpes) if mpes else np.nan,
                         mpjpe=np.mean(mpjpes) if mpjpes else np.nan,
                         cvr=np.mean(cvrs) if cvrs else np.nan,
                         n=len(mpes)))
    df = pd.DataFrame(rows)
    os.makedirs(dir_prefix, exist_ok=True)
    df.to_csv(os.path.join(dir_prefix, "data_driven_ablation_results.csv"),
              index=False)
    return df


def run_physics_based_ablation_study(root_dir: str, dir_prefix: str,
                                     test_set: Tuple,
                                     cam_overrides: Optional[List[int]]
                                     = None,
                                     max_trials: Optional[int] = None
                                     ) -> pd.DataFrame:
    """Prior ablation over the physics-based mode (reference
    ``run_physics_based_ablation_study``, run_dataset.py:721-810): each
    configuration re-solves the monocular kinetic FTE in joint-estimation
    mode from the saved data-driven warm start and scores against the
    multi-view solution. The kinetic stage's "motion prior" is the torque +
    marker-smoothing energy (reference acinoset_opt.py:919-920), so the
    sweep is the full pose x motion grid like the reference's."""
    configs = [("both", False, False), ("no-pose", True, False),
               ("no-motion", False, True), ("neither", True, True)]
    rows = []
    trials = test_set[:max_trials] if max_trials else test_set
    for label, no_pose, no_motion in configs:
        mpes, mpjpes, cvrs = [], [], []
        for idx, (cheetah, date, name) in enumerate(trials):
            data_path = os.path.join(date, cheetah, name)
            if not os.path.isdir(os.path.join(root_dir, data_path)):
                continue
            cam = cam_overrides[idx] if cam_overrides else None
            est = est_mod.init_trajectory(
                root_dir, data_path, cheetah, monocular_enable=True,
                override_monocular_cam=cam, kinematic_model=False)
            est_mod.determine_contacts(est, monocular=True,
                                       out_dir_prefix=dir_prefix)
            ok = est_mod.estimate_kinetics(
                est, joint_estimation=True, disable_pose_prior=no_pose,
                disable_motion_prior=no_motion,
                out_dir_prefix=dir_prefix)
            if not ok:
                continue
            s = _score_against_multiview(
                dir_prefix, data_path, f"fte_kinetic_{est.scene.cam_idx}")
            if s:
                mpes.append(s[0])
                mpjpes.append(s[1])
                cvrs.append(s[2])
        rows.append(dict(config=label,
                         mpe=np.mean(mpes) if mpes else np.nan,
                         mpjpe=np.mean(mpjpes) if mpjpes else np.nan,
                         cvr=np.mean(cvrs) if cvrs else np.nan,
                         n=len(mpes)))
    df = pd.DataFrame(rows)
    os.makedirs(dir_prefix, exist_ok=True)
    df.to_csv(os.path.join(dir_prefix, "physics_based_ablation_results.csv"),
              index=False)
    return df


def run_degradation_sweep(rates: Tuple[float, ...] = (0.0, 1.0, 2.0, 4.0,
                                                      8.0),
                          n_frames: int = 64,
                          data_driven_dataset: Optional[str] = None,
                          out_dir: Optional[str] = None,
                          include_physics: bool = False,
                          max_trials: int = 10,
                          verbose: bool = True) -> pd.DataFrame:
    """Monocular default vs data-driven across correlated-DLC corruption
    levels (occlusion bursts at ``rate``, limb confusion at ``0.6 * rate``
    events/cam/100 frames), batched on the accelerator and scored against
    the true synthetic GT. This is the regime argument for the learned
    priors: i.i.d. pixel noise alone never produces the
    confident-but-wrong failures that make them win (the reference's
    motivation, acinoset_misc.py:291-336,680-714). Writes
    ``degradation_sweep.csv``.

    With ``include_physics`` a third column runs the physics-based FTE
    (joint torque/GRF estimation, reference estimate_kinetics,
    acinoset_opt.py:693-963) warm-started from each rate's data-driven
    solution — the headroom argument for the dynamics: on near-clean data
    the welded multistarted warm starts are already dynamics-consistent
    and physics is quality-neutral, while under heavy correlated
    corruption the warm start degrades and the EOM/torque/contact terms
    recover reconstruction accuracy the cameras cannot."""
    import jax
    import jax.numpy as jnp

    from ..models import params as params_mod
    from ..models import skeleton as sk
    from ..parallel import batch as pbatch
    from ..priors import armodel, dataset as prior_ds, gmm as gmm_mod
    from ..solver import kinematic as kin
    from ..utils import data_ops
    from ..utils.device import host_cpu
    from . import bench_lib

    subject = params_mod.get_subject("acinoset")
    dset = data_driven_dataset or est_mod.DATA_DRIVEN_DATASET
    with host_cpu():
        df = prior_ds.load_pose_dataset(dset)
        gp = gmm_mod.to_solver_prior(gmm_mod.fit(
            df.iloc[:, 6:28].to_numpy(), n_components=5, seed=42,
            cache_dir=data_ops.prior_cache_dir(dset)))
        mm = armodel.train_motion_model(
            dset, window_size=4, lasso=True,
            cache_dir=data_ops.prior_cache_dir(dset))
    trajs = bench_lib.load_reference_trajectories(max_trials)
    fte_def = kin.KinematicFTE(
        kin.KinematicConfig(fisheye=True, robust=True), subject)
    fte_gmm = kin.KinematicFTE(
        kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True),
        subject)
    fte_dd = kin.KinematicFTE(
        kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True,
                            use_ar=True), subject)
    # production monocular path: the prior-free solve runs the demand-driven
    # heading multistart (parallel/batch.py — probe all restarts, finish the
    # winner), matching run_monocular_batched/bench; the GMM chain and the
    # dd refinement are warm-started from an already-converged trajectory,
    # so they stay single-start
    vdef = pbatch.make_kinematic_multistart(fte_def)
    vgmm = jax.jit(jax.vmap(fte_gmm.make_solver()))
    vdd = jax.jit(jax.vmap(fte_dd.make_solver()))
    kvrun = None
    if include_physics:
        from ..solver import kinetic as kn
        from . import contacts as contacts_mod
        kfte = kn.KineticFTE(kn.KineticConfig(use_gmm=True), subject)
        kvrun = jax.jit(jax.vmap(kfte.make_solver()))

    def mpjpe(qs, gts):
        out = []
        with host_cpu():
            for i, g in enumerate(gts):
                n = g.shape[0]
                rec = np.asarray(sk.fk_markers(
                    jnp.asarray(np.asarray(qs[i, :n], np.float64)), subject))
                a = rec - rec[:, :1]
                b = g - g[:, :1]
                out.append(1e3 * float(np.mean(
                    np.linalg.norm(a - b, axis=-1))))
        return float(np.mean(out))

    rows = []
    for rate in rates:
        datas, q0s, gts = [], [], []
        datas_plain, q_gts, fpss = [], [], []
        for i, (q_gt, name, fps) in enumerate(trajs):
            d, q0, tr = bench_lib.build_monocular_problem(
                q_gt, "acinoset", fps, seed=i, cam_idx=2,
                occlusion_rate=rate, confusion_rate=0.6 * rate)
            datas.append(d._replace(gmm=gp))
            datas_plain.append(d)
            q0s.append(q0)
            gts.append(tr.markers_gt)
            q_gts.append(tr.q_gt)
            fpss.append(fps)
        bat, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames,
                                        dtype=jnp.float32)
        q_def = vdef(q0b, bat).q
        # production dd path (estimator.estimate_kinematics): GMM chain
        # warm-started from the prior-free solve + the per-trial
        # prior-confidence gate; gated trials ship the prior-free solution
        q_chain = vgmm(q_def, bat).q
        vcost = jax.jit(jax.vmap(lambda q, d: fte_def._cost(q, d, 1.0)))
        c_free = np.asarray(vcost(q_def, bat), np.float64)
        c_chain = np.asarray(vcost(q_chain, bat), np.float64)
        prior_ok = jnp.asarray(est_mod.prior_gate_accept(
            c_chain, c_free))[:, None, None]
        q_boot = jnp.where(prior_ok, q_chain, q_def)
        qd_np = np.asarray(q_boot, np.float64)
        ypreds, ws, valids = [], [], []
        fv = np.asarray(bat.frame_valid)
        with host_cpu():
            for i in range(len(datas)):
                x_boot = np.asarray(sk.relative_pose(qd_np[i]))
                yp, vl = armodel.anchor_predictions(mm, x_boot)
                vl = vl * fv[i]
                ws.append(armodel.adaptive_motion_weights(mm, yp, x_boot,
                                                          vl))
                ypreds.append(yp)
                valids.append(vl)
        bat_dd = bat._replace(ar=kin.ARAnchor(
            jnp.asarray(np.stack(ypreds), jnp.float32),
            jnp.asarray(np.stack(ws), jnp.float32),
            jnp.asarray(np.stack(valids), jnp.float32)))
        q_dd = jnp.where(prior_ok, vdd(q_boot, bat_dd).q, q_def)
        row = dict(rate=rate, default_mpjpe=round(mpjpe(q_def, gts), 1),
                   dd_mpjpe=round(mpjpe(q_dd, gts), 1))
        row["improvement_pct"] = round(
            100.0 * (1 - row["dd_mpjpe"] / max(row["default_mpjpe"], 1e-9)),
            1)
        if include_physics:
            qdd64 = np.asarray(q_dd, np.float64)
            qs_dd = [qdd64[i, : g.shape[0]] for i, g in enumerate(gts)]
            with host_cpu():
                gphs = [contacts_mod.estimate_ground_height(qg, subject)
                        for qg in q_gts]
            kbat, q_warm_b = bench_lib.build_physics_batch(
                datas_plain, qs_dd, fpss, subject, n_frames=n_frames,
                dtype=jnp.float32, ground_heights=gphs)
            # waves of 5: with curv_chunk the B=10 x N=64 batch fits HBM in
            # one wave, but two 5-lane waves measure faster on the v5e
            # (while_loop straggler sync — see bench.py's wave rationale)
            B = q_warm_b.shape[0]
            kqs = []
            for i in range(0, B, 5):
                st = kvrun(q_warm_b[i:i + 5],
                           jax.tree.map(lambda x: x[i:i + 5], kbat))
                kqs.append(np.asarray(st.q, np.float64))
            q_phys = np.concatenate(kqs)
            row["physics_mpjpe"] = round(mpjpe(q_phys, gts), 1)
            row["physics_vs_dd_pct"] = round(
                100.0 * (1 - row["physics_mpjpe"]
                         / max(row["dd_mpjpe"], 1e-9)), 1)
        rows.append(row)
        if verbose:
            msg = (f"[sweep] rate={rate}: default {row['default_mpjpe']} "
                   f"dd {row['dd_mpjpe']} ({row['improvement_pct']}%)")
            if include_physics:
                msg += (f" physics {row['physics_mpjpe']} "
                        f"({row['physics_vs_dd_pct']}% vs dd)")
            print(msg, flush=True)
    out = pd.DataFrame(rows)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        out.to_csv(os.path.join(out_dir, "degradation_sweep.csv"),
                   index=False)
    return out


def _ablation_bootstrap(groups, dset, dtype, verbose=True):
    """Shared monocular bootstrap per subject group for the batched
    ablations: prior-free multistart solve + gated 5-component GMM chain
    (the production data-driven warm start). Returns per-group
    (subject, ests, bbat, q_free, q_boot, gp)."""
    import jax
    import jax.numpy as jnp

    from ..models import params as params_mod
    from ..parallel import batch as pbatch
    from ..priors import dataset as prior_ds, gmm as gmm_mod
    from ..solver import kinematic as kin
    from ..utils import data_ops

    out = []
    for subject_name, ests in groups.items():
        subject = params_mod.get_subject(subject_name)
        gp = gmm_mod.to_solver_prior(gmm_mod.fit(
            prior_ds.load_pose_dataset(dset).iloc[:, 6:28].to_numpy(),
            n_components=5, seed=42,
            cache_dir=data_ops.prior_cache_dir(dset)))
        datas = [est.data._replace(gmm=gp) for _, est in ests]
        q0s = [est.q0 for _, est in ests]
        nf = int(np.ceil(max(d.meas.shape[0] for d in datas) / 16) * 16)
        bbat, bq0 = pbatch.pad_and_stack(datas, q0s, n_frames=nf,
                                         dtype=dtype)
        free = kin.KinematicFTE(
            kin.KinematicConfig(fisheye=True, robust=True), subject)
        st_free = pbatch.make_kinematic_multistart(free)(bq0, bbat)
        chain = kin.KinematicFTE(
            kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True),
            subject)
        st_chain = jax.jit(jax.vmap(chain.make_solver()))(st_free.q, bbat)
        vcost = jax.jit(jax.vmap(lambda q, d: free._cost(q, d, 1.0)))
        c_free = np.asarray(vcost(st_free.q, bbat), np.float64)
        c_chain = np.asarray(vcost(st_chain.q, bbat), np.float64)
        broken = ~np.isfinite(c_chain) & np.isfinite(c_free)
        if broken.any():
            raise RuntimeError(
                f"ablation bootstrap chain non-finite on trials "
                f"{np.flatnonzero(broken).tolist()}")
        ok = jnp.asarray(est_mod.prior_gate_accept(
            c_chain, c_free))[:, None, None]
        q_boot = jnp.where(ok, st_chain.q, st_free.q)
        out.append((subject, ests, bbat, st_free.q, q_boot, gp))
        if verbose:
            print(f"[ablation] bootstrap {subject_name}: "
                  f"{len(ests)} trials", flush=True)
    return out


def _score_rows(rows_acc, configs, label_order, out_csv, dir_prefix):
    rows = []
    for label in label_order:
        acc = rows_acc[label]
        rows.append(dict(config=label,
                         mpe=float(np.mean(acc["mpe"])) if acc["mpe"]
                         else np.nan,
                         mpjpe=float(np.mean(acc["mpjpe"])) if acc["mpjpe"]
                         else np.nan,
                         cvr=float(np.mean(acc["cvr"])) if acc["cvr"]
                         else np.nan,
                         n=len(acc["mpe"])))
    df = pd.DataFrame(rows)
    os.makedirs(dir_prefix, exist_ok=True)
    df.to_csv(os.path.join(dir_prefix, out_csv), index=False)
    return df


def _score_q_against_multiview(q, est, data_path, dir_prefix, subject):
    """In-memory counterpart of _score_against_multiview: FK the solved q
    and score vs the saved multi-view solution."""
    from ..models import skeleton as sk
    from ..utils.device import host_cpu

    base = os.path.join(dir_prefix, data_path)
    gt_p = os.path.join(base, "fte_kinematic", "fte.pickle")
    if not os.path.exists(gt_p):
        return None
    gtd = dio.load_fte_pickle(gt_p)
    with host_cpu():
        pos = np.asarray(sk.fk_markers(np.asarray(q, np.float64), subject))
        com = np.asarray(sk.com_position(np.asarray(q, np.float64),
                                         subject))
    gt = np.asarray(gtd["positions"])
    n = min(len(gt), len(pos))
    mpe_tbl, _, _ = metrics_mod.traj_error(gt[:n].copy(), pos[:n].copy(),
                                           verbose=False)
    mpjpe_tbl, _, _ = metrics_mod.traj_error(gt[:n].copy(), pos[:n].copy(),
                                             centered=True, verbose=False)
    fps = est.scene.fps
    com_vel = (com[1:n] - com[:n - 1]) * fps
    cvr = metrics_mod.rmse(np.asarray(gtd["com_vel"])[:n - 1], com_vel)
    return (float(mpe_tbl.mean().iloc[0]),
            float(mpjpe_tbl.mean().iloc[0]), float(cvr))


def run_data_driven_ablation_batched(root_dir: str, dir_prefix: str,
                                     test_set: Tuple,
                                     cam_overrides: Optional[List[int]]
                                     = None,
                                     max_trials: Optional[int] = None,
                                     data_driven_dataset: Optional[str]
                                     = None,
                                     dtype=None,
                                     verbose: bool = True) -> pd.DataFrame:
    """Pose/motion prior on-off ablation as vmapped batches (the serial
    driver solves 4 configs x 10 trials one IPOPT-style solve at a time,
    ~hours through the tunnel; here each config is ONE vmapped solve from a
    shared production bootstrap). Same CSV schema as
    run_data_driven_ablation_study."""
    import jax
    import jax.numpy as jnp

    from ..models import skeleton as sk
    from ..parallel import batch as pbatch
    from ..priors import armodel
    from ..solver import kinematic as kin
    from ..utils import data_ops
    from ..utils.device import host_cpu
    from . import batched as batched_mod

    if dtype is None:
        dtype = jnp.float32
    trials = test_set[:max_trials] if max_trials else test_set
    dset = data_driven_dataset or est_mod.DATA_DRIVEN_DATASET
    from collections import defaultdict

    from ..models import params as params_mod
    groups = defaultdict(list)
    for idx, (cheetah, date, name) in enumerate(trials):
        data_path = os.path.join(date, cheetah, name)
        if not os.path.isdir(os.path.join(root_dir, data_path)):
            continue
        cam = cam_overrides[idx] if cam_overrides else None
        est = batched_mod._prepare(root_dir, data_path, cheetah, cam,
                                   monocular=True)
        groups[params_mod.get_subject(cheetah).name].append(
            (data_path, est))

    configs = [("both", True, True), ("no-pose", False, True),
               ("no-motion", True, False), ("neither", False, False)]
    rows_acc = {label: dict(mpe=[], mpjpe=[], cvr=[])
                for label, _, _ in configs}
    mm = armodel.train_motion_model(
        dset, window_size=4, lasso=True,
        cache_dir=data_ops.prior_cache_dir(dset))
    for subject, ests, bbat, q_free, q_boot, gp in _ablation_bootstrap(
            groups, dset, dtype, verbose):
        fv = np.asarray(bbat.frame_valid)

        def ar_batch(q_src_np):
            """AR anchors + adaptive weights from the given bootstrap."""
            yps, ws, vls = [], [], []
            with host_cpu():
                for i in range(len(ests)):
                    x = np.asarray(sk.relative_pose(q_src_np[i]))
                    yp, vl = armodel.anchor_predictions(mm, x)
                    vl = vl * fv[i]
                    ws.append(armodel.adaptive_motion_weights(mm, yp, x, vl))
                    yps.append(yp)
                    vls.append(vl)
            return bbat._replace(ar=kin.ARAnchor(
                jnp.asarray(np.stack(yps), dtype),
                jnp.asarray(np.stack(ws), dtype),
                jnp.asarray(np.stack(vls), dtype)))

        # arm-consistent bootstraps (ADVICE r4 #2: the serial study's
        # disable_pose_prior arms exclude the GMM from the bootstrap chain
        # entirely, so the prior-disabled arms here must not inherit GMM
        # information through the warm start or the AR anchor inputs):
        # use_gmm arms start from the gated GMM chain, no-pose arms from the
        # prior-free solve, with AR anchors recomputed from each source.
        bat_ar_boot = ar_batch(np.asarray(q_boot, np.float64))
        bat_ar_free = ar_batch(np.asarray(q_free, np.float64))
        for label, use_gmm, use_ar in configs:
            if not (use_gmm or use_ar):
                qs = np.asarray(q_free, np.float64)
            else:
                fte = kin.KinematicFTE(
                    kin.KinematicConfig(fisheye=True, robust=True,
                                        use_gmm=use_gmm, use_ar=use_ar),
                    subject)
                q0_arm = q_boot if use_gmm else q_free
                bat_arm = bat_ar_boot if use_gmm else bat_ar_free
                st = jax.jit(jax.vmap(fte.make_solver()))(q0_arm, bat_arm)
                qs = np.asarray(st.q, np.float64)
            for i, (data_path, est) in enumerate(ests):
                n = est.data.meas.shape[0]
                s = _score_q_against_multiview(qs[i, :n], est, data_path,
                                               dir_prefix, subject)
                if s:
                    rows_acc[label]["mpe"].append(s[0])
                    rows_acc[label]["mpjpe"].append(s[1])
                    rows_acc[label]["cvr"].append(s[2])
            if verbose:
                print(f"[ablation] dd {label}: "
                      f"mpe {np.mean(rows_acc[label]['mpe']):.1f}",
                      flush=True)
    return _score_rows(rows_acc, configs, [c[0] for c in configs],
                       "data_driven_ablation_results.csv", dir_prefix)


def run_physics_ablation_batched(root_dir: str, dir_prefix: str,
                                 test_set: Tuple,
                                 cam_overrides: Optional[List[int]] = None,
                                 max_trials: Optional[int] = None,
                                 data_driven_dataset: Optional[str] = None,
                                 dtype=None,
                                 verbose: bool = True) -> pd.DataFrame:
    """Prior ablation over the physics-based mode as vmapped batches: each
    configuration is ONE vmapped kinetic solve warm-started from the saved
    data-driven artifacts (requires the monocular pipeline's outputs). The
    kinetic 'motion prior' is the torque + marker-smoothing energy
    (estimator.estimate_kinetics maps disable_motion_prior to
    torque_weight~0 / smooth_weight_scale=0). Same CSV schema as
    run_physics_based_ablation_study."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from ..parallel import batch as pbatch
    from ..priors import dataset as prior_ds, gmm as gmm_mod
    from ..solver import kinetic as kn
    from ..utils import data_ops
    from . import batched as batched_mod

    if dtype is None:
        dtype = jnp.float32
    trials = test_set[:max_trials] if max_trials else test_set
    dset = data_driven_dataset or est_mod.DATA_DRIVEN_DATASET
    from collections import defaultdict

    from ..models import params as params_mod
    groups = defaultdict(list)
    for idx, (cheetah, date, name) in enumerate(trials):
        data_path = os.path.join(date, cheetah, name)
        if not os.path.isdir(os.path.join(root_dir, data_path)):
            continue
        cam = cam_overrides[idx] if cam_overrides else None
        est = batched_mod._prepare(root_dir, data_path, cheetah, cam,
                                   monocular=True)
        groups[params_mod.get_subject(cheetah).name].append(
            (data_path, est))

    configs = [("both", True, True), ("no-pose", False, True),
               ("no-motion", True, False), ("neither", False, False)]
    rows_acc = {label: dict(mpe=[], mpjpe=[], cvr=[])
                for label, _, _ in configs}
    gp = gmm_mod.to_solver_prior(gmm_mod.fit(
        prior_ds.load_pose_dataset(dset).iloc[:, 6:28].to_numpy(),
        n_components=5, seed=42, cache_dir=data_ops.prior_cache_dir(dset)))
    for subject_name, ests in groups.items():
        subject = params_mod.get_subject(subject_name)
        kds, qws = [], []
        for data_path, est in ests:
            d = est_mod._load_warm_start(est, True, dir_prefix)
            est.com_vel, est.com_pos = d["com_vel"], d["com_pos"]
            est_mod.determine_contacts(est, monocular=True,
                                       out_dir_prefix=dir_prefix)
            base_dir = os.path.join(dir_prefix, est.data_path)
            with open(os.path.join(base_dir, "grf",
                                   "autogen-contact.json"),
                      encoding="utf-8") as f:
                cj = _json.load(f)
            N = est.params.end_frame - est.params.start_frame
            stance = kn.stance_matrix(cj["contacts"], cj["start_frame"], N)
            stance = kn.prune_stance(stance, np.asarray(d["q"]), subject,
                                     1.0 / est.scene.fps)
            kds.append(kn.KineticData(
                base=est.data._replace(gmm=gp),
                stance=jnp.asarray(stance),
                grf_fixed=jnp.zeros((N, 4)),
                grf_xy_fixed=jnp.zeros((N, 4, 4)),
                use_fixed_grf=jnp.asarray(0.0),
                q_warm=jnp.asarray(d["q"]),
                ground_z=jnp.asarray(est.params.ground_plane_height)))
            qws.append(np.asarray(d["q"]))
        nf = int(np.ceil(max(kd.base.meas.shape[0]
                             for kd in kds) / 16) * 16)
        kbat, q_warm_b = pbatch.pad_and_stack_kinetic(kds, qws,
                                                      n_frames=nf,
                                                      dtype=dtype)
        for label, use_gmm, use_motion in configs:
            cfg = kn.KineticConfig(
                fisheye=True, robust=True, use_gmm=use_gmm,
                torque_weight=1.0 if use_motion else 1e-6,
                smooth_weight_scale=0.1 if use_motion else 0.0)
            kfte = kn.KineticFTE(cfg, subject)
            kvrun = jax.jit(jax.vmap(kfte.make_solver()))
            qs_parts = []
            for i in range(0, q_warm_b.shape[0], 5):
                st = kvrun(q_warm_b[i:i + 5],
                           jax.tree.map(lambda x: x[i:i + 5], kbat))
                qs_parts.append(np.asarray(st.q, np.float64))
            qs = np.concatenate(qs_parts)
            for i, (data_path, est) in enumerate(ests):
                n = est.data.meas.shape[0]
                s = _score_q_against_multiview(qs[i, :n], est, data_path,
                                               dir_prefix, subject)
                if s:
                    rows_acc[label]["mpe"].append(s[0])
                    rows_acc[label]["mpjpe"].append(s[1])
                    rows_acc[label]["cvr"].append(s[2])
            if verbose:
                print(f"[ablation] physics {label}: "
                      f"mpe {np.mean(rows_acc[label]['mpe']):.1f}",
                      flush=True)
    return _score_rows(rows_acc, configs, [c[0] for c in configs],
                       "physics_based_ablation_results.csv", dir_prefix)


def run_deadband_sweep(base_deadbands: Tuple = (None, 0.1, 0.05, 0.02,
                                                0.01, 0.0),
                       grf_maxes: Tuple[float, ...] = (5.0, 3.0),
                       n_frames: int = 64, max_trials: int = 10,
                       out_dir: Optional[str] = None,
                       verbose: bool = True) -> pd.DataFrame:
    """Physics-stage CoM-dynamics leverage curve.

    The base-translation EOM deadband (solver.kinetic.KineticConfig
    .base_deadband) and the GRF cap (grf_max) were built to make the
    physics stage OWN the CoM-velocity metric (the reference's physics
    mode takes CoM-vel RMSE 0.70 -> 0.50 m/s, BASELINE.md /
    dataset_results.csv), but round 3 measured only a 0.8 % win at the
    shipped (0.05, 5.0). This sweep measures the actual response surface
    on the clean synthetic 10-trial set: per configuration, the batched
    physics solve warm-starts from ONE shared default-mode kinematic
    solution and is scored against the true synthetic GT (CoM-velocity
    RMSE + MPE). ``base_deadband=None`` uses the relative EOM floor for
    the base rows (the round-2 behavior the deadband was meant to fix).
    Writes ``deadband_sweep.csv``.
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from ..models import params as params_mod
    from ..models import skeleton as sk
    from ..parallel import batch as pbatch
    from ..solver import kinematic as kin
    from ..solver import kinetic as kn
    from ..utils.device import host_cpu
    from . import bench_lib
    from . import contacts as contacts_mod

    subject = params_mod.get_subject("acinoset")
    trajs = bench_lib.load_reference_trajectories(max_trials)
    datas, q0s, trials, fpss = [], [], [], []
    for i, (q_gt, name, fps) in enumerate(trajs):
        d, q0, tr = bench_lib.build_monocular_problem(q_gt, "acinoset",
                                                      fps, seed=i)
        datas.append(d)
        q0s.append(q0)
        trials.append(tr)
        fpss.append(fps)
    bat, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames,
                                    dtype=jnp.float32)
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    st = pbatch.make_kinematic_multistart(fte)(q0b, bat)
    qs64 = np.asarray(st.q, np.float64)

    def comvel_rmse(qs):
        out = []
        with host_cpu():
            for i, tr in enumerate(trials):
                n = tr.q_gt.shape[0]
                cv_r = np.diff(np.asarray(sk.com_position(
                    jnp.asarray(qs[i, :n]), subject)), axis=0) * fpss[i]
                cv_g = np.diff(np.asarray(sk.com_position(
                    jnp.asarray(tr.q_gt), subject)), axis=0) * fpss[i]
                out.append(np.sqrt(np.mean(
                    np.sum((cv_r - cv_g) ** 2, axis=1))))
        return float(np.mean(out))

    def mpe(qs):
        out = []
        with host_cpu():
            for i, tr in enumerate(trials):
                n = tr.q_gt.shape[0]
                rec = np.asarray(sk.fk_markers(
                    jnp.asarray(qs[i, :n]), subject))
                out.append(1e3 * np.mean(np.linalg.norm(
                    rec - tr.markers_gt, axis=2)))
        return float(np.mean(out))

    cv_warm, mpe_warm = comvel_rmse(qs64), mpe(qs64)
    if verbose:
        print(f"[deadband] warm start: CoMvel={cv_warm:.3f} "
              f"MPE={mpe_warm:.0f}mm", flush=True)
    qs_warm = [qs64[i, : tr.q_gt.shape[0]] for i, tr in enumerate(trials)]
    with host_cpu():
        gphs = [contacts_mod.estimate_ground_height(tr.q_gt, subject)
                for tr in trials]
    kbat, q_warm_b = bench_lib.build_physics_batch(
        datas, qs_warm, fpss, subject, n_frames=n_frames,
        dtype=jnp.float32, ground_heights=gphs)
    B = q_warm_b.shape[0]
    rows = []
    for gm in grf_maxes:
        for bd in base_deadbands:
            cfg = kn.KineticConfig(use_gmm=True, base_deadband=bd,
                                   grf_max=gm)
            kfte = kn.KineticFTE(cfg, subject)
            kvrun = jax.jit(jax.vmap(kfte.make_solver()))
            kqs = []
            for i in range(0, B, 5):
                s = kvrun(q_warm_b[i:i + 5],
                          jax.tree.map(lambda x: x[i:i + 5], kbat))
                kqs.append(np.asarray(s.q, np.float64))
            q_phys = np.concatenate(kqs)
            cv = comvel_rmse(q_phys)
            row = dict(base_deadband=("floor" if bd is None else bd),
                       grf_max=gm,
                       comvel_rmse=round(cv, 4),
                       comvel_warm=round(cv_warm, 4),
                       comvel_improvement_pct=round(
                           100.0 * (1.0 - cv / max(cv_warm, 1e-9)), 1),
                       mpe_mm=round(mpe(q_phys), 1),
                       mpe_warm_mm=round(mpe_warm, 1))
            rows.append(row)
            if verbose:
                print(f"[deadband] bd={row['base_deadband']} grf_max={gm}: "
                      f"CoMvel={cv:.3f} ({row['comvel_improvement_pct']}%) "
                      f"MPE={row['mpe_mm']}mm", flush=True)
    out = pd.DataFrame(rows)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        out.to_csv(os.path.join(out_dir, "deadband_sweep.csv"), index=False)
    return out


def model_selection_analysis(data_driven_dataset: Optional[str] = None,
                             pose_components: Tuple[int, ...] =
                             (1, 2, 3, 4, 5, 6, 7),
                             window_sizes: Tuple[int, ...] =
                             (1, 2, 3, 4, 5, 6, 7),
                             out_dir: Optional[str] = None) -> Dict:
    """Model-level hyper-parameter curves (reference run_grid_search's model
    statistics, run_dataset.py:813-915): GMM train/validation mean
    log-likelihood per component count, and AR train/validation RMSE +
    non-zero parameter counts per window size for L1 then L2 regression.
    Saves ``grid_search.pickle`` with the reference's key schema so
    ``results.data_driven_analysis`` can plot it."""
    from ..priors import armodel, dataset as prior_ds, gmm as gmm_mod
    from ..utils import data_ops

    dset = data_driven_dataset or est_mod.DATA_DRIVEN_DATASET
    df = prior_ds.load_pose_dataset(dset)
    vpath = os.path.join(os.path.dirname(dset), "validation_dataset.h5")
    dfv = prior_ds.load_pose_dataset(vpath)
    X = df.iloc[:, 6:28].to_numpy()
    Xv = dfv.iloc[:, 6:28].to_numpy()

    out: Dict[str, List[float]] = {
        "gmm_train_likelihood": [], "gmm_validation_likelihood": [],
        "lr_train_rmse": [], "lr_validation_rmse": [], "lr_non_zeros": []}
    for k in pose_components:
        params = gmm_mod.fit(X, n_components=k, seed=42)
        out["gmm_train_likelihood"].append(gmm_mod.score(params, X))
        out["gmm_validation_likelihood"].append(gmm_mod.score(params, Xv))
    for lasso in (True, False):                      # L1 first, then L2
        for w in window_sizes:
            mm = armodel.train_motion_model(
                dset, window_size=w, lasso=lasso,
                cache_dir=data_ops.prior_cache_dir(dset))
            out["lr_train_rmse"].append(mm.train_rmse)
            out["lr_validation_rmse"].append(mm.validation_rmse)
            out["lr_non_zeros"].append(mm.model_non_zeros)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        data_ops.save_pickle(os.path.join(out_dir, "grid_search.pickle"),
                             out)
    return out


def run_forced_vs_gated_bench(out_csv: str =
                              "docs/artifacts/forced_vs_gated.csv",
                              n_frames: int = 64,
                              prior_guard_ratio: float = 1.10,
                              dtype=None,
                              chain_cfg_overrides: Optional[Dict] = None,
                              verbose: bool = True) -> pd.DataFrame:
    """Per-trial forced-vs-gated data-driven evidence on the bench set
    (VERDICT r4 ask #1): for each of the 10 synthetic bench trials, score
    against the TRUE synthetic ground truth

      default    — prior-free multistart solve (production default mode)
      chain      — GMM-bootstrap refinement, ungated
      dd_gated   — production data-driven output (gate at prior_guard_ratio;
                   rejected trials ship the prior-free solution)
      dd_forced  — the same machinery with the gate forced open on every
                   trial (prior engaged 10/10, the reference's behavior —
                   acinoset_misc.py:680-714 adds the GMM cost on EVERY
                   monocular solve with no gate)

    each both before and after the ground-plane depth anchor, plus the
    per-trial chain/free prior-free cost ratio the gate thresholds on.
    """
    import jax
    import jax.numpy as jnp

    from ..models import params as P
    from ..models import skeleton as sk
    from ..parallel import batch as pbatch
    from ..priors import armodel, dataset as prior_ds, gmm as gmm_mod
    from ..solver import kinematic as kin
    from ..utils import data_ops
    from ..utils.device import host_cpu
    from . import bench_lib
    from . import contacts as cmod

    if dtype is None:
        dtype = jnp.float32
    subject = P.get_subject("acinoset")
    names = bench_lib.reference_trial_paths(10)
    trajs = bench_lib.load_reference_trajectories(10)
    datas, q0s, trials, fpss = [], [], [], []
    for i, (q_gt, _, fps) in enumerate(trajs):
        d, q0, tr = bench_lib.build_monocular_problem(q_gt, "acinoset", fps,
                                                      seed=i)
        datas.append(d)
        q0s.append(q0)
        trials.append(tr)
        fpss.append(fps)
    batched, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames,
                                        dtype=dtype)
    B = q0b.shape[0]
    with host_cpu():
        gphs = [cmod.estimate_ground_height(tr.q_gt, subject)
                for tr in trials]
        dset = est_mod.DATA_DRIVEN_DATASET
        df = prior_ds.load_pose_dataset(dset)
        gp = gmm_mod.to_solver_prior(gmm_mod.fit(
            df.iloc[:, 6:28].to_numpy(), n_components=5, seed=42,
            cache_dir=data_ops.prior_cache_dir(dset)))
        mm = armodel.train_motion_model(
            dset, window_size=4, lasso=True,
            cache_dir=data_ops.prior_cache_dir(dset))
    bat_dd = jax.tree.map(jnp.asarray, batched)._replace(
        gmm=jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x, dtype),
                                       (B,) + np.asarray(x).shape), gp))

    free = kin.KinematicFTE(kin.KinematicConfig(fisheye=True, robust=True),
                            subject)
    st_free = pbatch.make_kinematic_multistart(free)(q0b, bat_dd)
    overrides = dict(chain_cfg_overrides or {})
    if overrides.get("base_anchor_trans", 0.0) > 0.0 \
            or overrides.get("base_anchor_rot", 0.0) > 0.0:
        # pin the prior-constrained solves' base pose to the prior-free
        # solution (see solver.kinematic.KinematicData.base_ref)
        bat_dd = bat_dd._replace(base_ref=st_free.q[:, :, :6])
    chain_cfg = kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True,
                                    **overrides)
    chain = kin.KinematicFTE(chain_cfg, subject)
    st_chain = jax.jit(jax.vmap(chain.make_solver()))(st_free.q, bat_dd)
    vcost = jax.jit(jax.vmap(lambda q, d: free._cost(q, d, 1.0)))
    c_free = np.asarray(vcost(st_free.q, bat_dd), np.float64)
    c_chain = np.asarray(vcost(st_chain.q, bat_dd), np.float64)
    ratio = c_chain / c_free
    gate = est_mod.prior_gate_accept(c_chain, c_free, prior_guard_ratio)
    if verbose:
        print(f"[fvg] gate accepts {int(gate.sum())}/{B}", flush=True)

    fte_dd = kin.KinematicFTE(
        kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True,
                            use_ar=True, **overrides), subject)
    vdd = jax.jit(jax.vmap(fte_dd.make_solver()))
    fv = np.asarray(bat_dd.frame_valid)

    def dd_solve(accept_mask):
        """Production dd machinery with the given per-trial gate outcome:
        bootstrap select -> AR anchors from the bootstrap -> GMM+AR solve ->
        rejected trials revert to the prior-free solution
        (pipeline/batched.py:248-319 semantics)."""
        qb = jnp.where(jnp.asarray(accept_mask)[:, None, None],
                       st_chain.q, st_free.q)
        qb_np = np.asarray(qb, np.float64)
        yps, ws, vls = [], [], []
        with host_cpu():
            for i in range(B):
                x = np.asarray(sk.relative_pose(qb_np[i]))
                yp, vl = armodel.anchor_predictions(mm, x)
                vl = vl * fv[i]
                ws.append(armodel.adaptive_motion_weights(mm, yp, x, vl))
                yps.append(yp)
                vls.append(vl)
        bat = bat_dd._replace(ar=kin.ARAnchor(
            jnp.asarray(np.stack(yps), dtype),
            jnp.asarray(np.stack(ws), dtype),
            jnp.asarray(np.stack(vls), dtype)))
        st = vdd(qb, bat)
        q = jnp.where(jnp.asarray(accept_mask)[:, None, None], st.q,
                      jnp.asarray(np.asarray(st_free.q), dtype))
        return q, bat

    q_gated, bat_g = dd_solve(gate)
    q_forced, bat_f = dd_solve(np.ones(B, bool))
    anchor = bench_lib.make_anchor_polish(subject, dtype)
    variants = {
        "default": (st_free.q, bat_dd),
        "chain": (st_chain.q, bat_dd),
        "dd_gated": (q_gated, bat_g),
        "dd_forced": (q_forced, bat_f),
    }
    rows = [dict(trial=names[i], ratio=float(ratio[i]),
                 gate=bool(gate[i])) for i in range(B)]
    for label, (q, bat) in variants.items():
        pre = bench_lib.score_per_trial(np.asarray(q, np.float64), trials,
                                        fpss, subject)
        q_a = anchor(q, bat, trials, fpss, gphs)
        post = bench_lib.score_per_trial(np.asarray(q_a, np.float64),
                                         trials, fpss, subject)
        for i in range(B):
            rows[i][f"mpe_{label}"] = pre[i][0]
            rows[i][f"mpjpe_{label}"] = pre[i][1]
            rows[i][f"cvr_{label}"] = pre[i][2]
            rows[i][f"mpe_{label}_anch"] = post[i][0]
            rows[i][f"mpjpe_{label}_anch"] = post[i][1]
            rows[i][f"cvr_{label}_anch"] = post[i][2]
        if verbose:
            print(f"[fvg] {label}: MPE {np.mean([r[0] for r in pre]):.1f} "
                  f"-> anch {np.mean([r[0] for r in post]):.1f}  "
                  f"CoMvel {np.mean([r[2] for r in pre]):.3f} "
                  f"-> {np.mean([r[2] for r in post]):.3f}", flush=True)
    df_out = pd.DataFrame(rows)
    if out_csv:
        os.makedirs(os.path.dirname(out_csv), exist_ok=True)
        df_out.to_csv(out_csv, index=False)
    return df_out


def run_physics_lever_sweep(n_frames: int = 64, max_trials: int = 10,
                            out_csv: Optional[str] =
                            "docs/artifacts/physics_lever_sweep.csv",
                            variants: Optional[Dict[str, Dict]] = None,
                            verbose: bool = True) -> pd.DataFrame:
    """Physics-stage leverage response surface (VERDICT r4 ask #3).

    The round-4 physics stage moved its warm start by <0.5 mm MPE and its
    prior ablation was flat to 0.04 mm — this sweep measures which solver
    levers actually give the kinetic solve reconstruction authority. Per
    variant (KineticConfig overrides + optional solver-stage overrides)
    the batched physics solve runs from the SAME shared kinematic warm
    start and is scored against the true synthetic GT: CoM-velocity RMSE
    (the dynamics-level metric the stage owns — reference pattern 0.70 ->
    0.50, BASELINE.md), MPE, MPJPE, plus mean accepted-LM-iteration count
    (an inert solve shows near-zero accepted steps). Writes
    ``physics_lever_sweep.csv``.
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from ..models import params as params_mod
    from ..parallel import batch as pbatch
    from ..solver import kinematic as kin
    from ..solver import kinetic as kn
    from ..utils.device import host_cpu
    from . import bench_lib
    from . import contacts as contacts_mod

    subject = params_mod.get_subject("acinoset")
    trajs = bench_lib.load_reference_trajectories(max_trials)
    datas, q0s, trials, fpss = [], [], [], []
    for i, (q_gt, name, fps) in enumerate(trajs):
        d, q0, tr = bench_lib.build_monocular_problem(q_gt, "acinoset",
                                                      fps, seed=i)
        datas.append(d)
        q0s.append(q0)
        trials.append(tr)
        fpss.append(fps)
    bat, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames,
                                    dtype=jnp.float32)
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    st = pbatch.make_kinematic_multistart(fte)(q0b, bat)
    qs64 = np.asarray(st.q, np.float64)
    warm = bench_lib.score_per_trial(qs64, trials, fpss, subject)
    w_mpe, w_mpjpe, w_cv = (float(np.mean([r[i] for r in warm]))
                            for i in range(3))
    if verbose:
        print(f"[levers] kinematic warm start: MPE={w_mpe:.1f} "
              f"MPJPE={w_mpjpe:.1f} CoMvel={w_cv:.3f}", flush=True)
    qs_warm = [qs64[i, : tr.q_gt.shape[0]] for i, tr in enumerate(trials)]
    with host_cpu():
        gphs = [contacts_mod.estimate_ground_height(tr.q_gt, subject)
                for tr in trials]
    kbat, q_warm_b = bench_lib.build_physics_batch(
        datas, qs_warm, fpss, subject, n_frames=n_frames,
        dtype=jnp.float32, ground_heights=gphs)
    B = q_warm_b.shape[0]

    if variants is None:
        variants = {
            "production": dict(),
            "eom_weight_x10": dict(eom_weight=1e5),
            "deadband_1.0": dict(eom_deadband=1.0),
            "deadband_0.5": dict(eom_deadband=0.5),
            "smooth_x3": dict(smooth_weight_scale=0.3),
            "smooth_0": dict(smooth_weight_scale=0.0),
            "guard_off": dict(meas_guard=0.0),
            "long_stages": dict(_stages=((3.0, 60), (1.7, 60), (1.0, 200))),
            "lam0_0.5": dict(_lam0=0.5),
            "perturbed_warm": dict(_perturb=0.02),
        }
    rows = []
    for label, ov in variants.items():
        ov = dict(ov)
        stages = ov.pop("_stages", ((3.0, 40), (1.7, 40), (1.0, 100)))
        lam0 = ov.pop("_lam0", 10.0)
        perturb = ov.pop("_perturb", 0.0)
        cfg = kn.KineticConfig(use_gmm=True, **ov)
        kfte = kn.KineticFTE(cfg, subject)
        kvrun = jax.jit(jax.vmap(kfte.make_solver(stages=stages,
                                                  lam0=lam0)))
        qw = q_warm_b
        if perturb > 0.0:
            rng = np.random.default_rng(0)
            qw = q_warm_b + jnp.asarray(
                perturb * rng.standard_normal(q_warm_b.shape),
                q_warm_b.dtype)
        kqs, its = [], []
        for i in range(0, B, 5):
            s = kvrun(qw[i:i + 5],
                      jax.tree.map(lambda x: x[i:i + 5], kbat))
            kqs.append(np.asarray(s.q, np.float64))
            its.append(np.asarray(s.n_accepted, np.float64))
        q_phys = np.concatenate(kqs)
        sc = bench_lib.score_per_trial(q_phys, trials, fpss, subject)
        mpe_v, mpjpe_v, cv_v = (float(np.mean([r[i] for r in sc]))
                                for i in range(3))
        row = dict(variant=label,
                   mpe_mm=round(mpe_v, 2), mpjpe_mm=round(mpjpe_v, 2),
                   comvel_rmse=round(cv_v, 4),
                   dmpe_mm=round(mpe_v - w_mpe, 2),
                   dmpjpe_mm=round(mpjpe_v - w_mpjpe, 2),
                   comvel_improvement_pct=round(
                       100.0 * (1.0 - cv_v / max(w_cv, 1e-9)), 1),
                   mean_accepted_iters=round(
                       float(np.mean(np.concatenate(its))), 1))
        rows.append(row)
        if verbose:
            print(f"[levers] {label}: MPE={row['mpe_mm']} "
                  f"dMPJPE={row['dmpjpe_mm']} CoMvel={row['comvel_rmse']} "
                  f"({row['comvel_improvement_pct']}%) "
                  f"it={row['mean_accepted_iters']}", flush=True)
    out = pd.DataFrame(rows)
    if out_csv:
        os.makedirs(os.path.dirname(out_csv), exist_ok=True)
        out.to_csv(out_csv, index=False)
    return out
