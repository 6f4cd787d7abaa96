"""Trajectory error metrics (reference ``traj_error``/``traj_smoothness``/
``compare_traj_error``, acinoset_misc.py:1170-1329, and ``rmse``)."""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from ..data import io as dio
from ..models.skeleton import MARKERS


def rmse(predictions: np.ndarray, targets: np.ndarray) -> float:
    d = np.asarray(predictions) - np.asarray(targets)
    return float(np.sqrt(np.nanmean((d**2).ravel())))


def traj_smoothness(X: np.ndarray, Y: np.ndarray) -> float:
    """Mean |d|frame-to-frame displacement| difference| between two marker
    trajectories (reference acinoset_misc.py:1170-1176)."""
    X, Y = np.asarray(X), np.asarray(Y)
    dx = np.linalg.norm(np.diff(X, axis=0), axis=2)
    dy = np.linalg.norm(np.diff(Y, axis=0), axis=2)
    return float(np.mean(np.abs(dx - dy)))


def traj_error(X: np.ndarray, Y: np.ndarray, model_name: str = "single view",
               centered: bool = False, verbose: bool = True
               ) -> Tuple[pd.DataFrame, np.ndarray, float]:
    """Per-joint MPJPE table (mm), per-frame error curve (mm), smoothness
    error (mm). ``centered`` subtracts per-frame marker centroids
    (root-relative MPJPE). Matches reference acinoset_misc.py:1179-1199."""
    smoothness_error_mm = traj_smoothness(X, Y) * 1000.0
    X = np.array(X, dtype=float)
    Y = np.array(Y, dtype=float)
    if centered:
        X -= X.mean(axis=1, keepdims=True)
        Y -= Y.mean(axis=1, keepdims=True)
    distances = np.sqrt(np.sum((X - Y)**2, axis=2))
    trajectory_error_mm = distances.mean(axis=1) * 1000.0
    mpjpe_mm = distances.mean(axis=0) * 1000.0
    result = pd.DataFrame(mpjpe_mm.reshape(1, len(MARKERS)), columns=MARKERS)
    if verbose:
        print(f"{model_name} {'mpjpe' if centered else 'mpe'} [mm]: "
              f"{float(result.mean(axis=1).iloc[0]):.1f}")
        print(f"{model_name} smoothness error [mm]: "
              f"{smoothness_error_mm:.1f}")
    result = result.transpose()
    result.columns = ["mpjpe (mm)"]
    return result.astype(float), trajectory_error_mm, smoothness_error_mm


def compare_traj_error(data_dir: str, cam_idx: int,
                       include_kinetic: bool = False,
                       kinetic_out_fname: str = "fte",
                       save_plots: bool = True) -> Dict[str, Dict]:
    """Monocular-vs-multiview scoring + plots (reference
    ``compare_traj_error``, acinoset_misc.py:1202-1314). Returns the metric
    values keyed by mode."""
    gt = dio.load_fte_pickle(os.path.join(data_dir, "fte_kinematic",
                                          "fte.pickle"))["positions"]
    out: Dict[str, Dict] = {}
    modes = [("single view", f"fte_kinematic_orig_{cam_idx}", "fte"),
             ("data-driven", f"fte_kinematic_{cam_idx}", "fte")]
    if include_kinetic:
        modes.append(("physics-based", f"fte_kinetic_{cam_idx}",
                      kinetic_out_fname))
    per_frame = {}
    per_joint = {}
    for name, sub, fname in modes:
        path = os.path.join(data_dir, sub, f"{fname}.pickle")
        if not os.path.exists(path):
            continue
        pos = dio.load_fte_pickle(path)["positions"]
        n = min(len(pos), len(gt))
        mpjpe_tbl, frame_err, smooth = traj_error(gt[:n].copy(),
                                                  pos[:n].copy(), name)
        _, _, _ = traj_error(gt[:n].copy(), pos[:n].copy(), name, True)
        dist = np.sqrt(np.sum((gt[:n] - pos[:n])**2, axis=2))
        distc = np.sqrt(np.sum(
            ((gt[:n] - gt[:n].mean(1, keepdims=True))
             - (pos[:n] - pos[:n].mean(1, keepdims=True)))**2, axis=2))
        out[name] = {
            "mpe_mm": float(dist.mean() * 1000),
            "mpjpe_mm": float(distc.mean() * 1000),
            "smoothness_mm": smooth,
            "per_joint": mpjpe_tbl,
        }
        per_frame[name] = frame_err
        per_joint[name] = mpjpe_tbl
    if save_plots and per_frame:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(16, 12), dpi=60)
        for name, err in per_frame.items():
            plt.plot(err, label=name)
        plt.xlabel("Finite Element")
        plt.ylabel("Error (mm)")
        plt.legend()
        last_sub = modes[-1][1]
        tgt = os.path.join(data_dir, last_sub)
        if os.path.isdir(tgt):
            suffix = ("" if kinetic_out_fname == "fte"
                      else kinetic_out_fname[-1])
            fig.savefig(os.path.join(tgt, f"traj_error{suffix}.pdf"))
            df = pd.DataFrame({k: v["mpjpe (mm)"]
                               for k, v in per_joint.items()})
            ax = df.plot(kind="barh")
            f2 = ax.get_figure()
            f2.set_size_inches(16, 12)
            plt.xlabel("Error (mm)")
            plt.ylabel("Joint")
            f2.savefig(os.path.join(tgt, f"mpjpe_dist{suffix}.pdf"))
            plt.close("all")
        plt.close(fig)
    return out
