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


def _score_against_multiview(dir_prefix: str, data_path: str,
                             sub: str) -> Optional[Tuple[float, float]]:
    base = os.path.join(dir_prefix, data_path)
    gt_p = os.path.join(base, "fte_kinematic", "fte.pickle")
    p = os.path.join(base, sub, "fte.pickle")
    if not (os.path.exists(gt_p) and os.path.exists(p)):
        return None
    gt = dio.load_fte_pickle(gt_p)["positions"]
    pos = dio.load_fte_pickle(p)["positions"]
    n = min(len(gt), len(pos))
    mpe_tbl, _, _ = metrics_mod.traj_error(gt[:n].copy(), pos[:n].copy(),
                                           verbose=False)
    mpjpe_tbl, _, _ = metrics_mod.traj_error(gt[:n].copy(), pos[:n].copy(),
                                             centered=True, verbose=False)
    return float(mpe_tbl.mean().iloc[0]), float(mpjpe_tbl.mean().iloc[0])


def run_grid_search(root_dir: str, dir_prefix: str, test_set: Tuple,
                    pose_components: Tuple[int, ...] = (3, 5, 8),
                    windows: Tuple[int, ...] = (2, 4, 6, 10),
                    lasso_options: Tuple[bool, ...] = (True, False),
                    cam_overrides: Optional[List[int]] = None,
                    max_trials: Optional[int] = 3) -> pd.DataFrame:
    """GMM-components x AR-window x L1/L2 sweep over the data-driven mode
    (reference run_dataset.py:813-915)."""
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
                                   max_trials: Optional[int] = 3
                                   ) -> pd.DataFrame:
    """Pose/motion prior on-off ablation (reference run_dataset.py:635-810)."""
    configs = [("both", False, False), ("no-pose", True, False),
               ("no-motion", False, True), ("neither", True, True)]
    rows = []
    trials = test_set[:max_trials] if max_trials else test_set
    for label, no_pose, no_motion in configs:
        mpes, mpjpes = [], []
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
        rows.append(dict(config=label,
                         mpe=np.mean(mpes) if mpes else np.nan,
                         mpjpe=np.mean(mpjpes) if mpjpes else np.nan,
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
                                     max_trials: Optional[int] = 3
                                     ) -> pd.DataFrame:
    """Pose-prior on/off ablation over the physics-based mode (reference
    ``run_physics_based_ablation_study``, run_dataset.py:721-810): each
    configuration re-solves the monocular kinetic FTE in joint-estimation
    mode from the saved data-driven warm start and scores against the
    multi-view solution. The reference's motion-prior axis is a no-op in the
    kinetic stage (the AR anchor only enters the kinematic solve), so the
    sweep here is pose prior on/off."""
    configs = [("pose", False), ("no-pose", True)]
    rows = []
    trials = test_set[:max_trials] if max_trials else test_set
    for label, no_pose in configs:
        mpes, mpjpes = [], []
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
                out_dir_prefix=dir_prefix)
            if not ok:
                continue
            s = _score_against_multiview(
                dir_prefix, data_path, f"fte_kinetic_{est.scene.cam_idx}")
            if s:
                mpes.append(s[0])
                mpjpes.append(s[1])
        rows.append(dict(config=label,
                         mpe=np.mean(mpes) if mpes else np.nan,
                         mpjpe=np.mean(mpjpes) if mpjpes else np.nan,
                         n=len(mpes)))
    df = pd.DataFrame(rows)
    os.makedirs(dir_prefix, exist_ok=True)
    df.to_csv(os.path.join(dir_prefix, "physics_based_ablation_results.csv"),
              index=False)
    return df


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
