"""Results and biomechanics analysis layer.

TPU-native port of the reference ``results.py`` computational cores: 2D
reprojection metrics against hand labels, stance-normalized gait curves
(joint angles / torques / power per limb role), GRF error against force
plates, LCP complementarity checking, and contact-detection precision/recall.
Plot helpers render with the Agg backend; every metric is also returned as
data so the analysis is scriptable without matplotlib.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..data import io as dio
from ..dynamics.eom import FOOT_NAMES, TORQUE_MAP
from ..models import skeleton as sk


# ---------------------------------------------------------------------------
# 2D reprojection metrics (reference results.py:1458-1605)
# ---------------------------------------------------------------------------

def kinematic_error(q: np.ndarray, q_ref: np.ndarray) -> Dict[str, float]:
    """Base / relative-joint RMSE between two q-trajectories (reference
    ``joint_error``/``kinematic_error``, acinoset_opt.py:375-386)."""
    q, q_ref = np.asarray(q), np.asarray(q_ref)
    n = min(len(q), len(q_ref))
    base = float(np.sqrt(np.mean((q[:n, :6] - q_ref[:n, :6])**2)))
    rel = float(np.sqrt(np.mean((q[:n, 6:] - q_ref[:n, 6:])**2)))
    return {"base_rmse": base, "relative_rmse": rel}


def reprojection_errors(fte_dir: str, hand_labeled_dir: str,
                        out_fname: str = "fte",
                        dlc_thresh: float = 0.5,
                        save_artifacts: bool = False) -> Dict[str, float]:
    """Pixel error stats of saved cam*_fte reprojections vs hand labels.

    With ``save_artifacts`` the per-point errors are persisted as
    ``reprojection.pickle`` / ``reprojection_results.csv`` in fte_dir
    (reference metrics(), results.py:1458-1551)."""
    errs = []
    import glob as _glob
    for cam_path in sorted(_glob.glob(os.path.join(
            fte_dir, f"cam*_{out_fname}.csv"))):
        cam_name = os.path.basename(cam_path).split("_")[0]
        gt_path_h5 = os.path.join(hand_labeled_dir, f"{cam_name}.h5")
        gt_path_csv = os.path.join(hand_labeled_dir, f"{cam_name}.csv")
        gt_path = gt_path_h5 if os.path.exists(gt_path_h5) else gt_path_csv
        if not os.path.exists(gt_path):
            continue
        pred = dio.load_reprojection_table(cam_path)
        gt = dio.load_dlc_table(gt_path)
        gt = gt.droplevel(0, axis=1)
        common = pred.index.intersection(gt.index)
        for m in sk.MARKERS:
            if (m, "x") not in pred.columns or (m, "x") not in gt.columns:
                continue
            dx = pred.loc[common, (m, "x")].to_numpy(dtype=float) \
                - gt.loc[common, (m, "x")].to_numpy(dtype=float)
            dy = pred.loc[common, (m, "y")].to_numpy(dtype=float) \
                - gt.loc[common, (m, "y")].to_numpy(dtype=float)
            e = np.sqrt(dx * dx + dy * dy)
            errs.extend(e[np.isfinite(e)].tolist())
    errs = np.asarray(errs)
    if errs.size == 0:
        return {"mean_px": float("nan"), "median_px": float("nan"), "n": 0}
    out = {"mean_px": float(errs.mean()), "median_px": float(
        np.median(errs)), "std_px": float(errs.std()), "n": int(errs.size)}
    if save_artifacts:
        import pickle as _pickle
        with open(os.path.join(fte_dir, "reprojection.pickle"), "wb") as f:
            _pickle.dump({"errors_px": errs, **out}, f)
        pd.DataFrame([out]).to_csv(
            os.path.join(fte_dir, "reprojection_results.csv"), index=False)
    return out


# ---------------------------------------------------------------------------
# gait analysis (reference results.py:514-751)
# ---------------------------------------------------------------------------

LIMB_JOINTS = {
    # limb -> (hip/shoulder, knee, ankle) torque-map column names
    "FL": ("front-left-hip-pitch:y", "UFL_LFL_torque:y", "LFL_HFL_torque:y"),
    "FR": ("front-right-hip-pitch:y", "UFR_LFR_torque:y",
           "LFR_HFR_torque:y"),
    "BL": ("back-left-hip-pitch:y", "UBL_LBL_torque:y", "LBL_HBL_torque:y"),
    "BR": ("back-right-hip-pitch:y", "UBR_LBR_torque:y", "LBR_HBR_torque:y"),
}

_TAU_COL = {n: i for i, n in enumerate(TORQUE_MAP.names)}


def contact_json_conversion(json_path: str) -> Dict[str, List]:
    """Contact json -> per-role (side, start, end) table
    (reference results.py:514-546)."""
    with open(json_path, "r", encoding="utf-8") as f:
        cj = json.load(f)
    start_frame, end_frame = cj["start_frame"], cj["end_frame"]
    order = cj["contacts"]
    ret = {"forelimb-trailing": ["", 0, 0], "forelimb-leading": ["", 0, 0],
           "hindlimb-leading": ["", 0, 0], "hindlimb-trailing": ["", 0, 0]}
    for name in FOOT_NAMES:
        limb = "forelimb" if name[1] == "F" else "hindlimb"
        side = "right" if name[2] == "R" else "left"
        if name in order and order[name] is not None:
            data = order[name]
            s = data[0][0] - start_frame
            e = data[0][1] - start_frame
            if data[0][1] > end_frame:
                ret[f"{limb}-{data[0][3]}"] = [side, 0, 0]
            else:
                ret[f"{limb}-{data[0][3]}"] = [side, s - 1 if s > 0 else s,
                                               e + 1]
        else:
            other = order.get(
                f"{name[:2]}{'L' if side == 'right' else 'R'}_foot")
            if other is not None:
                role = "leading" if other[0][3] == "trailing" else "trailing"
                ret[f"{limb}-{role}"] = [side, 0, 0]
    return ret


def joint_angles(q: np.ndarray) -> Dict[str, np.ndarray]:
    """Relative hip/knee/ankle pitch per limb over the trajectory."""
    x = np.asarray(sk.relative_pose(np.asarray(q)))
    # relative-pose layout: base(6) bodyF(3) neck(3) tail0(2) tail1(2)
    # then theta per leg link: UFL LFL HFL UFR LFR HFR UBL LBL UBR LBR HBL HBR
    names = ["UFL", "LFL", "HFL", "UFR", "LFR", "HFR", "UBL", "LBL", "UBR",
             "LBR", "HBL", "HBR"]
    out = {}
    for i, n in enumerate(names):
        out[n] = x[:, 16 + i]
    return out


def stance_normalized(series: np.ndarray, start: int, end: int,
                      n_points: int = 101) -> np.ndarray:
    """Resample a per-frame series onto 0-100% stance."""
    seg = np.asarray(series)[start:end]
    if len(seg) < 2:
        return np.full(n_points, np.nan)
    xp = np.linspace(0, 100, len(seg))
    return np.interp(np.linspace(0, 100, n_points), xp, seg)


def gait_analysis(q: np.ndarray, tau: Optional[np.ndarray],
                  contact_json_path: str, fps: float) -> Dict:
    """Stance-normalized joint angle / torque / power curves per limb role
    (reference results.py:546-751)."""
    contacts = contact_json_conversion(contact_json_path)
    angles = joint_angles(q)
    # relative joint velocities for power
    dq = np.gradient(np.asarray(q), axis=0) * fps
    dangles = joint_angles(dq)
    out = {"angle": {}, "torque": {}, "power": {}, "contacts": contacts}
    for role, (side, s, e) in contacts.items():
        if e <= s:
            continue
        fore = role.startswith("forelimb")
        prefix = ("F" if fore else "B") + ("R" if side == "right" else "L")
        joints = LIMB_JOINTS[prefix]
        labels = ("hip", "knee", "ankle")
        for label, joint_col in zip(labels, joints):
            link = {"hip": "U", "knee": "L", "ankle": "H"}[label] + prefix
            ang = stance_normalized(angles[link], s, e)
            out["angle"][f"{role}-{label}"] = ang
            if tau is not None:
                tcol = np.asarray(tau)[:, _TAU_COL[joint_col]]
                tcurve = stance_normalized(tcol, s, e)
                out["torque"][f"{role}-{label}"] = tcurve
                p = tcol * dangles[link]
                out["power"][f"{role}-{label}"] = stance_normalized(p, s, e)
    return out


# ---------------------------------------------------------------------------
# GRF / LCP checks (reference results.py:17-31, 1416-1446)
# ---------------------------------------------------------------------------

def check_grf(grf_xy: np.ndarray, tol: float = 1e-6) -> Dict[str, float]:
    """Friction-polygon complementarity sanity (reference check_grf,
    results.py:17-31): the |x| = x+ + x- decomposition requires that
    opposite polygon components (+x/-x, +y/-y; dynamics.eom.POLYGON_D order
    0/2 and 1/3) are never simultaneously active."""
    g = np.asarray(grf_xy)                      # (N, 4 feet, 4 dirs)
    both_x = (g[..., 0] > tol) & (g[..., 2] > tol)
    both_y = (g[..., 1] > tol) & (g[..., 3] > tol)
    n_bad = int(both_x.sum() + both_y.sum())
    return {"n_invalid": n_bad, "ok": n_bad == 0}


def check_lcp(grf_z: np.ndarray, foot_heights: np.ndarray,
              tol: float = 1e-2) -> Dict[str, float]:
    """Epsilon-relaxed ground complementarity: GRFz * max(foot_height, 0)
    should be ~0 (the solver-side enable_lcp penalty's target)."""
    comp = np.asarray(grf_z) * np.maximum(np.asarray(foot_heights), 0.0)
    return {"max_violation": float(np.max(np.abs(comp))),
            "mean_violation": float(np.mean(np.abs(comp))),
            "ok": bool(np.max(np.abs(comp)) < tol)}


def grf_error(grf_z_est: np.ndarray, grf_z_meas: Dict[int, np.ndarray],
              contacts: Dict, start_frame: int) -> Dict[str, float]:
    """RMSE of estimated vertical GRF vs measured plates during stance."""
    errs = []
    for i, name in enumerate(FOOT_NAMES):
        seqs = contacts.get(name)
        if seqs is None:
            continue
        plate = seqs[0][2] - 1
        if plate not in grf_z_meas:
            continue
        meas = np.asarray(grf_z_meas[plate])[:, 2]
        for s, e, *_ in seqs:
            for f in range(s, e + 1):
                t = f - start_frame
                if 0 <= t < len(grf_z_est) and t < len(meas):
                    errs.append(grf_z_est[t, i] - meas[t])
    errs = np.asarray(errs)
    if errs.size == 0:
        return {"rmse_bw": float("nan"), "n": 0}
    return {"rmse_bw": float(np.sqrt(np.mean(errs**2))), "n": int(errs.size)}


# ---------------------------------------------------------------------------
# contact detection scoring (reference results.py:194-364)
# ---------------------------------------------------------------------------

def contact_detection_analysis(pred: Dict, labeled: Dict,
                               n_frames: int, start_frame: int
                               ) -> Dict[str, float]:
    """Per-frame precision/recall of predicted stances vs labeled stances."""
    def to_mask(contacts):
        m = np.zeros((n_frames, len(FOOT_NAMES)), bool)
        for i, name in enumerate(FOOT_NAMES):
            seqs = contacts.get(name)
            if seqs is None:
                continue
            for s, e, *_ in seqs:
                lo = max(s - start_frame, 0)
                hi = min(e - start_frame + 1, n_frames)
                m[lo:hi, i] = True
        return m

    p, l = to_mask(pred), to_mask(labeled)
    tp = np.sum(p & l)
    fp = np.sum(p & ~l)
    fn = np.sum(~p & l)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": float(precision), "recall": float(recall),
            "f1": float(f1), "tp": int(tp), "fp": int(fp), "fn": int(fn)}


def determine_dlc_performance(dlc_dir: str, hand_labeled_dir: str,
                              dlc_thresh: float = 0.5) -> Dict[str, float]:
    """DLC-vs-hand-label pixel statistics (reference results.py:420-479)."""
    from ..data.io import load_dlc_points

    xy_p, lik_p, _ = load_dlc_points(dlc_dir)
    xy_g, lik_g, _ = load_dlc_points(hand_labeled_dir)
    n = min(len(xy_p), len(xy_g))
    pred = np.where((lik_p[:n] > dlc_thresh)[..., None], xy_p[:n], np.nan)
    gt = np.where((lik_g[:n] > 0)[..., None], xy_g[:n], np.nan)
    resid = (gt - pred).reshape(-1)
    resid = resid[np.isfinite(resid)]
    if resid.size == 0:
        return {"rmse_px": float("nan"), "n": 0}
    return {"rmse_px": float(np.sqrt(np.mean(resid**2))),
            "mad_px": float(np.median(np.abs(resid - np.median(resid)))),
            "mean_px": float(resid.mean()), "std_px": float(resid.std()),
            "n": int(resid.size)}


def plot_cost_functions(out_path: str):
    """Robust-loss shape comparison (reference results.py:34-53)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops import losses
    import jax.numpy as jnp
    e = jnp.linspace(0, 30, 600)
    fig = plt.figure(figsize=(10, 6), dpi=60)
    plt.plot(e, np.asarray(losses.redescending(e)), label="redescending")
    plt.plot(e, np.asarray(losses.cauchy(e, 7.0)), label="cauchy c=7")
    plt.plot(e, np.asarray(losses.fair(e, 7.0)), label="fair c=7")
    plt.plot(e, np.asarray(0.5 * e * e), label="quadratic", ls="--")
    plt.ylim(0, 80)
    plt.xlabel("weighted residual")
    plt.ylabel("cost")
    plt.legend()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def plot_eom_error(fte_pickle_path: str, subject, out_path: str):
    """Per-frame EOM residual norm of a saved solution (reference
    results.py:871-888)."""
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.io import load_fte_pickle
    from ..dynamics import eom as dyn

    d = load_fte_pickle(fte_pickle_path)
    scale = subject.total_mass * dyn.GRAVITY
    res = []
    for t in range(2, d["q"].shape[0]):
        r = np.asarray(dyn.eom_residual(
            jnp.asarray(d["q"][t]), jnp.asarray(d["dq"][t]),
            jnp.asarray(d["ddq"][t]), jnp.zeros(4), jnp.zeros((4, 4)),
            subject)) / scale
        res.append(np.linalg.norm(r))
    fig = plt.figure(figsize=(10, 5), dpi=60)
    plt.plot(res)
    plt.xlabel("frame")
    plt.ylabel("|EOM residual| (body-weight units, zero contact)")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return np.asarray(res)


def get_power_values(q: np.ndarray, tau: np.ndarray, fps: float,
                     force_scale: float = 1.0) -> Dict[str, np.ndarray]:
    """Per-motor mechanical power traces (reference ``get_power_values``,
    results.py:406-417): power_i = tau_i * (B[:, i] . dq), the relative
    joint angular velocity each actuator works against, grouped per motor
    like the reference's ``pe.motor.torques(robot)`` list."""
    q = np.asarray(q, float)
    tau = np.asarray(tau, float)
    dq = np.gradient(q, axis=0) * fps
    rel_vel = dq @ TORQUE_MAP.B               # (N, n_tau)
    p_cols = tau * rel_vel[: len(tau)] * force_scale
    out: Dict[str, List[np.ndarray]] = {}
    for i, name in enumerate(TORQUE_MAP.names):
        motor = name.rsplit(":", 1)[0]
        out.setdefault(motor, []).append(p_cols[:, i])
    return {k: np.stack(v, axis=1) for k, v in out.items()}


def plot_power_values(q: np.ndarray, tau: np.ndarray, fps: float,
                      out_path: str, force_scale: float = 1.0
                      ) -> Dict[str, float]:
    """Total power-output trace with peak/average annotation (reference
    ``plot_power_values``, results.py:1281-1309; units are W/kg when tau is
    in body-weight units and force_scale = g)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    power = get_power_values(q, tau, fps, force_scale)
    total = np.sum(np.hstack(list(power.values())), axis=1)
    t = np.arange(len(total)) / fps
    fig = plt.figure(figsize=(16, 9), dpi=60)
    plt.plot(t, total, color="#36454f")
    plt.plot(t, np.full_like(total, total.mean()), color="#ff7f0e",
             linestyle="--", label="Mean")
    plt.title(f"Total power output of cheetah.\nPeak power: "
              f"{int(np.max(total))} W/kg, Avg power: "
              f"{int(np.mean(total))} W/kg")
    plt.ylabel("Total power (W/kg)")
    plt.xlabel("Time (s)")
    plt.legend()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return {"peak": float(np.max(total)), "mean": float(np.mean(total))}


# ---------------------------------------------------------------------------
# plots
# ---------------------------------------------------------------------------

def plot_torques(tau: np.ndarray, fps: float, out_path: str,
                 columns: Tuple[str, ...] = ("front-left-hip-pitch:y",
                                             "UFL_LFL_torque:y",
                                             "LFL_HFL_torque:y")):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    t = np.arange(len(tau)) / fps
    fig = plt.figure(figsize=(16, 9), dpi=60)
    for c in columns:
        plt.plot(t, np.asarray(tau)[:, _TAU_COL[c]], label=c)
    plt.xlabel("Time (s)")
    plt.ylabel("Torque (body-weight units)")
    plt.legend()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def plot_gait_attributes(analysis: Dict, out_path: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axs = plt.subplots(3, 1, figsize=(12, 14), dpi=60)
    for ax, key in zip(axs, ("angle", "torque", "power")):
        for label, curve in analysis[key].items():
            ax.plot(np.linspace(0, 100, len(curve)), curve, label=label)
        ax.set_ylabel(key)
        ax.set_xlabel("% stance")
        if analysis[key]:
            ax.legend(fontsize=7)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def torque_error(tau1: np.ndarray, tau2: np.ndarray):
    """Per-actuator torque RMSE between two solutions (reference
    ``torque_error``, results.py:1355-1374): returns (per-column RMSE,
    tau1, tau2)."""
    tau1 = np.asarray(tau1)
    tau2 = np.asarray(tau2)
    n = min(len(tau1), len(tau2))
    tau1, tau2 = tau1[:n], tau2[:n]
    per_col = np.linalg.norm(tau1 - tau2, axis=0) / np.sqrt(n)
    return per_col, tau1, tau2


def align_error_trajectories(trajectories: List[np.ndarray]):
    """Resample ragged error trajectories to a common length and compute
    band statistics (reference ``align_error_trajectories``,
    run_dataset.py:143-168). Returns (max_length, interpolated, mean, std,
    median, lower_quartile, upper_quartile, mad)."""
    max_length = max(len(t) for t in trajectories)
    target = np.linspace(0.0, 1.0, max_length)
    interp = np.stack([
        np.interp(target, np.linspace(0.0, 1.0, len(t)), np.asarray(t))
        for t in trajectories])
    med = np.median(interp, axis=0)
    return (max_length, interp, np.mean(interp, axis=0),
            np.std(interp, axis=0), med,
            np.quantile(interp, 0.25, axis=0),
            np.quantile(interp, 0.75, axis=0),
            np.median(np.abs(interp - med), axis=0))


def align_error_and_plot(x: List[np.ndarray], y: List[np.ndarray],
                         z: List[np.ndarray], file_name: str):
    """Median +- MAD error bands over time for the three monocular modes
    (reference ``align_error_and_plot``, run_dataset.py:171-205)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    stats = [align_error_trajectories(t) for t in (x, y, z)]
    assert stats[0][0] == stats[1][0] == stats[2][0]
    fig = plt.figure(figsize=(16, 12), dpi=60)
    for (n, _, _, _, med, _, _, mad), label, color in zip(
            stats, ("Default", "Data-driven", "Physics-based"),
            ("#36454f", "#2e8b57", "#ff7f0e")):
        plt.plot(med, color=color, label=label)
        plt.fill_between(range(n), med - mad, med + mad, color=color,
                         alpha=0.15)
    plt.title("MPE over time")
    plt.xlabel("Frames")
    plt.ylabel("Error (mm)")
    plt.legend()
    fig.savefig(file_name, bbox_inches="tight")
    plt.close(fig)


def save_error_dists(px_errors: Dict[int, np.ndarray],
                     output_dir: str) -> Tuple[float, float]:
    """Reprojection-error histograms + reprojection.pickle from per-camera
    pixel residuals (reference ``_save_error_dists``,
    results.py:1608-1657). Returns (mean, median)."""
    import pickle as _pickle

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    distances = np.concatenate([np.asarray(v, float).ravel()
                                for v in px_errors.values()])
    mean_error = float(np.mean(distances))
    med_error = float(np.median(distances))
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "reprojection.pickle"), "wb") as f:
        _pickle.dump({"error": distances, "mean_error": mean_error,
                      "med_error": med_error}, f)
    fig = plt.figure()
    ax = fig.add_subplot(1, 1, 1)
    ax.hist(distances, bins=50)
    ax.set_title(f"Error Overview (N={len(distances)}, "
                 f"mean={mean_error:.3f}, med={med_error:.3f})")
    ax.set_xlabel("Error [px]")
    ax.set_ylabel("Frequency")
    fig.savefig(os.path.join(output_dir, "overall_error_hist.pdf"))
    plt.close(fig)
    fig = plt.figure()
    ax = fig.add_subplot(1, 1, 1)
    ax.hist([np.asarray(v, float).ravel() for v in px_errors.values()],
            bins=10, density=True, histtype="bar")
    ax.legend([f"cam{int(k) + 1} (N={len(np.asarray(v).ravel())})"
               for k, v in px_errors.items()])
    ax.set_title("Reprojection Pixel Error")
    ax.set_xlabel("Error [px]")
    ax.set_ylabel("Frequency")
    fig.savefig(os.path.join(output_dir, "cams_error_hist.pdf"))
    plt.close(fig)
    return mean_error, med_error


def plot_3d_pose(fte_pickle_path: str, pose_idx: int, subject,
                 gmm_dataset: str, out_path: str, n_components: int = 5):
    """GMM pose-likelihood demo (reference ``plot_3d_pose``,
    results.py:773-868): score the solved pose and a deliberately distorted
    variant under the learned pose prior and render both skeletons."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..priors import dataset as prior_ds, gmm as gmm_mod
    from . import visualize

    d = dio.load_fte_pickle(fte_pickle_path)
    q_orig = np.asarray(d["q"][pose_idx])
    pos1 = np.asarray(d["positions"][pose_idx])
    q_bad = q_orig.copy()
    # reference distortion: kink the front-body/neck pitch+roll
    q_bad[3:12:3] = np.pi / 6
    q_bad[3:12:2] = -np.pi / 6
    pos2 = np.asarray(sk.fk_markers(q_bad[None], subject))[0]
    df = prior_ds.load_pose_dataset(gmm_dataset)
    model = gmm_mod.fit(df.iloc[:, 6:28].to_numpy(),
                        n_components=n_components, seed=42)
    x1 = np.asarray(sk.relative_pose(q_orig[None]))[0, 6:]
    x2 = np.asarray(sk.relative_pose(q_bad[None]))[0, 6:]
    ll1 = float(gmm_mod.score(model, x1[None])[0])
    ll2 = float(gmm_mod.score(model, x2[None])[0])
    pos1 = pos1 - pos1.mean(axis=0, keepdims=True)
    pos2 = pos2 - pos2.mean(axis=0, keepdims=True)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(1, 1, 1, projection="3d")
    visualize._draw_pose(ax, pos1, "#36454f", f"solved (ll={ll1:.1f})")
    visualize._draw_pose(ax, pos2, "#d62728", f"distorted (ll={ll2:.1f})")
    ax.legend()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return ll1, ll2


def std_dev(predictions: np.ndarray, targets: np.ndarray) -> float:
    """NaN-aware standard deviation of the residuals (reference
    results.py:497-500)."""
    return float(np.nanstd((np.asarray(predictions, float)
                            - np.asarray(targets, float)).flatten()))


def check_joint_estimation(root_dir: str, dir_prefix: str,
                           cheetah: str = "shiraz", date: str = "2009_09_08",
                           trial: str = "04") -> Dict[str, float]:
    """Compare a joint-estimation kinetic solution against the reference
    kinetic solution for the same trial: root-relative MPJPE + torque RMSE
    (reference ``check_joint_estimation``, results.py:141-191)."""
    from . import metrics as metrics_mod

    data_path = os.path.join("kinetic_dataset", date, cheetah,
                             f"trial{trial}")
    fte_gt = dio.load_fte_pickle(os.path.join(
        dir_prefix, data_path, "fte_kinetic", "fte.pickle"))
    fte = dio.load_fte_pickle(os.path.join(
        root_dir, data_path, "fte_kinetic", "fte.pickle"))
    result, err, _ = metrics_mod.traj_error(
        fte_gt["positions"].copy(), fte["positions"].copy(),
        "joint estimation", centered=True)
    # align per motor (and per frame within each motor): concatenating the
    # raveled dicts would misalign every motor after the first when the two
    # solutions differ in frame count or key order
    diffs = []
    for name in set(fte_gt["tau"]) & set(fte["tau"]):
        a = np.asarray(fte_gt["tau"][name], float)
        b = np.asarray(fte["tau"][name], float)
        a = a.reshape(a.shape[0], -1)
        b = b.reshape(b.shape[0], -1)
        n = min(a.shape[0], b.shape[0])
        k = min(a.shape[1], b.shape[1])
        diffs.append((a[:n, :k] - b[:n, :k]).ravel())
    tau_rmse = float(np.sqrt(np.nanmean(np.concatenate(diffs) ** 2))) \
        if diffs else float("nan")
    return {"mpjpe_mm": float(result.mean().iloc[0]),
            "torque_rmse": tau_rmse}


def example_robustness(root_dir: str, dir_prefix: str,
                       test_run: Tuple[str, str, str] =
                       ("phantom", "2019_03_07", "run"),
                       cam_space: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
                       ) -> Dict[str, List[float]]:
    """Per-camera robustness bar chart for one trial: mean root-relative
    MPJPE of default / data-driven / physics-based per camera index, saved
    as example-cam-robustness.pdf (reference results.py:56-138).

    ``root_dir`` is accepted for reference-signature parity but unused —
    like the reference, every pickle (GT and per-camera) is read from
    ``dir_prefix``."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from . import metrics as metrics_mod

    cheetah, date, trial = test_run
    data_path = os.path.join(date, cheetah, trial)
    vals: Dict[str, List[float]] = {
        "single_traj_error": [], "data_driven_traj_error": [],
        "physics_based_traj_error": []}
    cams: List[int] = []
    gt_path = os.path.join(dir_prefix, data_path, "fte_kinematic",
                           "fte.pickle")
    if not os.path.exists(gt_path):
        return vals
    gt = dio.load_fte_pickle(gt_path)["positions"]
    for cam_idx in cam_space:
        base = os.path.join(dir_prefix, data_path)
        paths = {k: os.path.join(base, f"{k}_{cam_idx}", "fte.pickle")
                 for k in ("fte_kinematic_orig", "fte_kinematic",
                           "fte_kinetic")}
        if not all(os.path.exists(p) for p in paths.values()):
            continue
        cams.append(cam_idx)
        for key, p in zip(("single_traj_error", "data_driven_traj_error",
                           "physics_based_traj_error"), paths.values()):
            pos = dio.load_fte_pickle(p)["positions"]
            _, err, _ = metrics_mod.traj_error(gt.copy(), pos.copy(),
                                               centered=True, verbose=False)
            vals[key].append(float(err.mean()))
    if cams:
        fig = plt.figure(figsize=(16, 12), dpi=60)
        width = 0.25
        x = np.arange(len(cams))
        plt.bar(x, vals["single_traj_error"], width, label="Default",
                color="#36454f")
        plt.bar(x + width, vals["data_driven_traj_error"], width,
                label="Data-driven", color="#2ca02c")
        plt.bar(x + 2 * width, vals["physics_based_traj_error"], width,
                label="Physics-based", color="#ff7f0e")
        plt.xticks(x + width, [str(c + 1) for c in cams])
        plt.ylabel("MPJPE (mm)")
        plt.xlabel("Camera")
        plt.legend()
        fig.savefig(os.path.join(dir_prefix, "example-cam-robustness.pdf"),
                    bbox_inches="tight")
        plt.close(fig)
    return vals


def ablation_study(dir_prefix: str):
    """Reference-scale ablation figure (reference ablation_study,
    results.py:890-985): grouped bars of MPE / MPJPE / CoM-vel RMSE over the
    four prior scenarios (Default, Pose, Motion, Pose + Motion) for the
    data-driven and physics-based model families, read from the ablation
    CSVs written by pipeline.studies. Saves ``ablation-study.pdf``."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt
    import pandas as pd

    d1 = pd.read_csv(os.path.join(dir_prefix,
                                  "data_driven_ablation_results.csv"))
    d2 = pd.read_csv(os.path.join(
        dir_prefix, "physics_based_ablation_results.csv"))
    # scenario -> config-label mapping ("Pose" = pose prior only, i.e. the
    # motion prior disabled)
    scenarios = ("Default", "Pose", "Motion", "Pose + Motion")
    labels = ("neither", "no-motion", "no-pose", "both")

    def series(df, col):
        by = df.set_index("config")[col]
        return [float(by.get(lbl, np.nan)) for lbl in labels]

    width = 0.25
    x = np.arange(len(scenarios))
    fig = plt.figure(figsize=(16, 9), dpi=120)
    gs = gridspec.GridSpec(2, 4)
    panels = [(plt.subplot(gs[0, :2]), "mpe", "MPE (mm)"),
              (plt.subplot(gs[0, 2:]), "mpjpe", "MPJPE (mm)"),
              (plt.subplot(gs[1, 1:3]), "cvr", "CVR (m/s)")]
    for ax, col, ylabel in panels:
        if col not in d1.columns:
            continue
        ax.bar(x - width / 2, series(d1, col), width, label="Data-driven")
        if col in d2.columns:
            ax.bar(x + width / 2, series(d2, col), width,
                   label="Physics-based")
        ax.set_xticks(x)
        ax.set_xticklabels(scenarios)
        ax.set_ylabel(ylabel)
    fig.legend(("Data-driven", "Physics-based"), loc="lower right")
    fig.savefig(os.path.join(dir_prefix, "ablation-study.pdf"),
                bbox_inches="tight")
    plt.close(fig)


def data_driven_analysis(dir_prefix: str,
                         pose_components: Tuple[int, ...] =
                         (1, 2, 3, 4, 5, 6, 7),
                         window_sizes: Tuple[int, ...] =
                         (1, 2, 3, 4, 5, 6, 7)) -> Dict:
    """Plot the model-selection curves written by
    ``studies.model_selection_analysis`` (grid_search.pickle): GMM
    train/validation likelihood vs components, AR train/validation RMSE and
    non-zero counts vs window for L1/L2 (reference results.py:988-1046);
    saved as PDFs next to the pickle."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils import data_ops

    data = data_ops.load_pickle(os.path.join(dir_prefix,
                                             "grid_search.pickle"))
    nw = len(window_sizes)
    fig = plt.figure(figsize=(16, 9), dpi=60)
    plt.plot(pose_components, data["gmm_train_likelihood"], marker="o",
             label="Train")
    plt.plot(pose_components, data["gmm_validation_likelihood"], marker="o",
             label="Test")
    plt.xlabel("# Components")
    plt.ylabel("Likelihood")
    plt.legend()
    fig.savefig(os.path.join(dir_prefix, "gmm_model_selection.pdf"),
                bbox_inches="tight")
    plt.close(fig)

    fig = plt.figure(figsize=(16, 9), dpi=60)
    axd = fig.subplot_mosaic([["left", "right"], ["bottom", "bottom"]])
    axd["left"].plot(window_sizes, data["lr_train_rmse"][:nw], marker="o",
                     label="Train")
    axd["left"].plot(window_sizes, data["lr_validation_rmse"][:nw],
                     marker="o", label="Test")
    axd["left"].set_title("L1-norm")
    axd["left"].set_ylabel("Model RMSE")
    axd["left"].set_xlabel("Window Size")
    axd["left"].legend()
    axd["right"].plot(window_sizes, data["lr_train_rmse"][nw:], marker="o",
                      label="Train")
    axd["right"].plot(window_sizes, data["lr_validation_rmse"][nw:],
                      marker="o", label="Test")
    axd["right"].set_title("L2-norm")
    axd["right"].set_ylabel("Model RMSE")
    axd["right"].set_xlabel("Window Size")
    axd["right"].legend()
    axd["bottom"].plot(window_sizes, data["lr_non_zeros"][:nw], marker="o",
                       label="L1-norm")
    axd["bottom"].plot(window_sizes, data["lr_non_zeros"][nw:], marker="o",
                       label="L2-norm")
    axd["bottom"].set_ylabel("# Non-zero Parameters")
    axd["bottom"].set_xlabel("Window Size")
    axd["bottom"].legend()
    fig.savefig(os.path.join(dir_prefix, "ar_model_selection.pdf"),
                bbox_inches="tight")
    plt.close(fig)

    # reconstruction-quality-vs-hyper-parameter mosaics (reference
    # data_driven_analysis, results.py:1035-1278): mean +- std MPE/MPJPE
    # marginalized over the OTHER grid axes, from the reconstruction grid
    # search CSV (studies.run_grid_search_batched) when it exists
    gs_csv = os.path.join(dir_prefix, "grid_search_results.csv")
    if os.path.exists(gs_csv):
        import pandas as pd
        gs = pd.read_csv(gs_csv)

        def band(ax, xs, mean, std, label=None):
            mean, std = np.asarray(mean, float), np.asarray(std, float)
            ax.plot(xs, mean, marker="o", label=label)
            ax.fill_between(xs, mean - std, mean + std, alpha=0.1)

        by_k = gs.groupby("n_components")
        fig = plt.figure(figsize=(16, 9), dpi=60)
        axd = fig.subplot_mosaic([["left", "right"]])
        ks = sorted(by_k.groups)
        band(axd["left"], ks, by_k["mpe"].mean(), by_k["mpe"].std())
        axd["left"].set_ylabel("Global MPE (mm)")
        axd["left"].set_xlabel("# Components")
        band(axd["right"], ks, by_k["mpjpe"].mean(), by_k["mpjpe"].std())
        axd["right"].set_ylabel("Root-relative MPJPE (mm)")
        axd["right"].set_xlabel("# Components")
        fig.savefig(os.path.join(dir_prefix,
                                 "gmm_components_vs_error.pdf"),
                    bbox_inches="tight")
        plt.close(fig)

        fig = plt.figure(figsize=(16, 9), dpi=60)
        axd = fig.subplot_mosaic([["left", "right"]])
        for lasso, lbl in ((True, "L1-norm"), (False, "L2-norm")):
            sub = gs[gs["lasso"] == lasso].groupby("window")
            ws = sorted(sub.groups)
            if not ws:
                continue
            band(axd["left"], ws, sub["mpe"].mean(), sub["mpe"].std(), lbl)
            band(axd["right"], ws, sub["mpjpe"].mean(), sub["mpjpe"].std(),
                 lbl)
        axd["left"].set_ylabel("Global MPE (mm)")
        axd["left"].set_xlabel("Window Size")
        axd["left"].legend()
        axd["right"].set_ylabel("Root-relative MPJPE (mm)")
        axd["right"].set_xlabel("Window Size")
        axd["right"].legend()
        fig.savefig(os.path.join(dir_prefix, "ar_window_vs_error.pdf"),
                    bbox_inches="tight")
        plt.close(fig)
    return data


def animate_torque_plot(tau: Dict[str, np.ndarray], fps: float,
                        out_path: str, force_scale: float = 1.0) -> None:
    """Animated per-motor torque bar chart over the trajectory (reference
    ``animate_torque_plot``, results.py:367-403), written as a GIF."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    names = list(tau.keys())
    arrs = [np.atleast_2d(np.asarray(tau[k], float).T).T * force_scale
            for k in names]
    n_frames = min(a.shape[0] for a in arrs)
    totals = [a.sum(axis=1) for a in arrs]
    vmax = max(float(np.nanmax(np.abs(t))) for t in totals)
    if not np.isfinite(vmax) or vmax == 0.0:
        vmax = 1.0

    fig, ax = plt.subplots(figsize=(16, 9), dpi=50)
    bars = ax.bar(range(len(names)), [t[0] for t in totals],
                  color="#36454f")
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ax.set_ylim(-1.1 * vmax, 1.1 * vmax)
    ax.set_ylabel("Torque")

    def update(i):
        for b, t in zip(bars, totals):
            b.set_height(t[i])
        ax.set_title(f"t = {i / fps:.3f} s")
        return bars

    anim = animation.FuncAnimation(fig, update, frames=n_frames,
                                   blit=False)
    anim.save(out_path, writer=animation.PillowWriter(
        fps=max(1, min(int(round(fps)), 30))))
    plt.close(fig)
