"""Synthetic trial generation for end-to-end validation.

The reference's shipped test set contains only solver *outputs* (fte.pickle,
reprojections) — the raw inputs (DLC detections, calibration, video) are not
distributed. To exercise the full pipeline end-to-end we therefore render
synthetic trials: take a ground-truth q trajectory (e.g. from a shipped
fte.pickle — realistic galloping motion), place a ring of calibrated fisheye
cameras around it, project the 24 markers, and corrupt with DLC-like noise
(Gaussian pixel error, outliers, dropped detections with low likelihood).

This yields (measurements, likelihoods, scene) in exactly the shapes the
estimator consumes, with known 3D ground truth for MPJPE scoring.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import numpy as np

from ..models import noise as noise_tables
from ..models import skeleton as sk
from ..models.params import SubjectParams
from ..utils.device import host_cpu


class SyntheticScene(NamedTuple):
    K: np.ndarray        # (C, 3, 3)
    D: np.ndarray        # (C, 4)
    R: np.ndarray        # (C, 3, 3)
    t: np.ndarray        # (C, 3)
    cam_res: Tuple[int, int]
    fps: float
    fisheye: bool


class SyntheticTrial(NamedTuple):
    q_gt: np.ndarray         # (N, 54)
    markers_gt: np.ndarray   # (N, 24, 3)
    meas: np.ndarray         # (N, C, 24, 2, 1) pixel detections
    likelihood: np.ndarray   # (N, C, 24, 1)
    scene: SyntheticScene
    subject_name: str


def _look_at(pos: np.ndarray, target: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    f = target - pos
    f = f / np.linalg.norm(f)
    up = np.array([0.0, 0.0, 1.0])
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    d = np.cross(f, r)
    R = np.stack([r, d, f])
    t = -R @ pos
    return R, t


def ring_cameras(center: np.ndarray, n_cams: int = 6, distance: float = 9.0,
                 height: float = 1.2, fps: float = 120.0,
                 fisheye: bool = True, arc: float = 2.4,
                 seed: int = 0) -> SyntheticScene:
    """Cameras on an arc around ``center``, all looking at it — mimicking the
    AcinoSet 6-camera field setup (one side of the running corridor)."""
    rng = np.random.default_rng(seed)
    Ks, Ds, Rs, ts = [], [], [], []
    angles = np.linspace(-arc / 2, arc / 2, n_cams)
    for a in angles:
        pos = center + np.array([distance * np.sin(a),
                                 -distance * np.cos(a), height])
        pos = pos + rng.normal(scale=0.2, size=3)
        R, t = _look_at(pos, center)
        K = np.array([[1400.0 + rng.normal(scale=20), 0.0, 1352.0],
                      [0.0, 1400.0 + rng.normal(scale=20), 760.0],
                      [0.0, 0.0, 1.0]])
        D = (np.array([-0.03, 0.01, -0.002, 0.0005])
             + rng.normal(scale=1e-3, size=4)) if fisheye else \
            np.array([-0.15, 0.03, 0.001, 0.0])
        Ks.append(K)
        Ds.append(D)
        Rs.append(R)
        ts.append(t)
    return SyntheticScene(np.stack(Ks), np.stack(Ds), np.stack(Rs),
                          np.stack(ts), (2704, 1520), fps, fisheye)


def gallop_trajectory(n_frames: int = 60, fps: float = 120.0,
                      speed: float = 12.0, seed: int = 0) -> np.ndarray:
    """Procedural galloping q trajectory (used when no reference pickle is
    available): straight run in +x with periodic limb/spine motion."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_frames) / fps
    stride_hz = 3.2
    ph = 2 * np.pi * stride_hz * t
    q = np.zeros((n_frames, 54))
    q[:, 0] = speed * t
    q[:, 1] = 0.02 * np.sin(0.5 * ph)
    q[:, 2] = 0.55 + 0.06 * np.sin(ph)
    q[:, 4] = 0.15 * np.sin(ph)           # base pitch
    q[:, 5] = np.pi                        # yaw: body -x axis faces +x
    names = sk.LINK_NAMES

    def set_theta(link, val):
        i = names.index(link)
        q[:, 3 * i + 4] = val

    def set_psi(link, val):
        i = names.index(link)
        q[:, 3 * i + 5] = val

    for ln in names[1:]:
        set_psi(ln, np.pi)
    set_theta("bodyF", -0.2 * np.sin(ph))
    set_theta("neck", -0.3 + 0.1 * np.sin(ph))
    set_theta("tail0", 0.3 * np.sin(ph + 1.0))
    set_theta("tail1", 0.4 * np.sin(ph + 1.5))
    legs = {"UFL": 0.0, "UFR": 0.4, "UBL": np.pi, "UBR": np.pi + 0.4}
    for leg, phase in legs.items():
        back = leg[1] == "B"
        swing = 0.6 * np.sin(ph + phase)
        set_theta(leg, swing)
        knee = (0.45 + 0.35 * np.sin(ph + phase + 0.8))
        set_theta("L" + leg[1:], swing + (knee if back else -knee))
        ank = (0.3 + 0.3 * np.sin(ph + phase + 1.2))
        set_theta("H" + leg[1:], swing + (knee if back else -knee)
                  + (-ank if back else ank))
    q += rng.normal(scale=0.005, size=q.shape)
    return q


# Left/right marker pairs (limb-confusion corruption): indices into
# skeleton.MARKERS — r_eye/l_eye, the four right-limb chains vs their left
# counterparts.
_LR_PAIRS = np.array([[1, 2],                       # eyes
                      [8, 12], [9, 13], [10, 14], [11, 15],   # front limbs
                      [16, 20], [17, 21], [18, 22], [19, 23]])  # back limbs
# marker groups that occlude together (a whole limb, the head, the tail)
_OCCLUSION_GROUPS = [[0, 1, 2], [3, 4, 5], [6, 7],
                     [8, 9, 10, 11], [12, 13, 14, 15],
                     [16, 17, 18, 19], [20, 21, 22, 23]]
# the two front / two back limb chains, for whole-limb confusion bursts
_LIMB_SWAPS = [(np.array([8, 9, 10, 11]), np.array([12, 13, 14, 15])),
               (np.array([16, 17, 18, 19]), np.array([20, 21, 22, 23]))]


def corrupt_dlc(meas: np.ndarray, likelihood: np.ndarray,
                rng: np.random.Generator,
                occlusion_rate: float = 0.0, occlusion_len: float = 8.0,
                confusion_rate: float = 0.0, confusion_len: float = 6.0,
                freeze_prob: float = 0.35, dlc_thresh: float = 0.5,
                lik_noise_px: float = 12.0
                ) -> Tuple[np.ndarray, np.ndarray]:
    """DLC-style *correlated* failure modes (the regime where the reference's
    monocular default collapses and the learned priors rescue it,
    ``acinoset_misc.py:291-336,680-714``):

    * **occlusion bursts** — a marker group (whole limb / head / tail)
      disappears for a contiguous window in one camera; with probability
      ``freeze_prob`` DLC instead reports the *entry position* with
      confident likelihood (tracking stuck on the occluder edge);
    * **limb left/right confusion** — a front or back limb pair swaps
      detections for a window, at full confidence (legs crossing);
    * **likelihood-correlated noise** — below-threshold detections are not
      merely gated out upstream: their reported positions degrade smoothly
      (extra noise ~ ``lik_noise_px * (thresh - lik)``), matching how real
      DLC heatmap peaks blur as confidence drops.

    ``meas`` (N, C, L, 2) and ``likelihood`` (N, C, L) are modified on a
    copy; rates are expected *events per camera per 100 frames*.
    """
    meas = meas.copy()
    likelihood = likelihood.copy()
    N, C, L = likelihood.shape

    def windows(rate, mean_len):
        n_ev = rng.poisson(rate * N / 100.0)
        out = []
        for _ in range(n_ev):
            s = int(rng.integers(0, max(N - 2, 1)))
            ln = max(2, int(rng.exponential(mean_len)))
            out.append((s, min(s + ln, N)))
        return out

    for c in range(C):
        for (s, e) in windows(occlusion_rate, occlusion_len):
            grp = _OCCLUSION_GROUPS[int(rng.integers(len(_OCCLUSION_GROUPS)))]
            if rng.uniform() < freeze_prob:
                # confident-but-frozen: stuck at the entry position
                meas[s:e, c, grp] = meas[s, c, grp][None]
                likelihood[s:e, c, grp] = rng.uniform(
                    0.85, 1.0, size=(e - s, len(grp)))
            else:
                likelihood[s:e, c, grp] = rng.uniform(
                    0.0, dlc_thresh, size=(e - s, len(grp)))
        for (s, e) in windows(confusion_rate, confusion_len):
            a, b = _LIMB_SWAPS[int(rng.integers(len(_LIMB_SWAPS)))]
            tmp = meas[s:e, c, a].copy()
            meas[s:e, c, a] = meas[s:e, c, b]
            meas[s:e, c, b] = tmp
            likelihood[s:e, c, a] = rng.uniform(0.8, 1.0,
                                                size=(e - s, len(a)))
            likelihood[s:e, c, b] = rng.uniform(0.8, 1.0,
                                                size=(e - s, len(b)))

    # likelihood-correlated degradation of low-confidence detections
    low = likelihood < dlc_thresh
    extra = lik_noise_px * (dlc_thresh - likelihood[low])
    meas[low] += rng.normal(size=(low.sum(), 2)) * extra[:, None]
    return meas, likelihood


def synthesize(q_gt: np.ndarray, subject: SubjectParams,
               scene: Optional[SyntheticScene] = None,
               noise_px: float = 1.5, outlier_frac: float = 0.02,
               outlier_px: float = 60.0, drop_frac: float = 0.05,
               dlc_thresh: float = 0.5, seed: int = 0,
               subject_name: str = "acinoset",
               occlusion_rate: float = 0.0, confusion_rate: float = 0.0
               ) -> SyntheticTrial:
    """Render noisy DLC-like detections of a q trajectory.

    ``occlusion_rate`` / ``confusion_rate`` > 0 additionally apply the
    correlated DLC failure model (:func:`corrupt_dlc`)."""
    import jax

    from ..ops import camera as cam_ops  # local import to keep numpy-only API

    rng = np.random.default_rng(seed)
    with host_cpu():
        # host-side rendering: keep the accelerator free of tiny one-off jits
        markers = np.asarray(sk.fk_markers(q_gt, subject))
        N = q_gt.shape[0]
        if scene is None:
            center = markers.mean(axis=(0, 1))
            scene = ring_cameras(center)
        C = scene.K.shape[0]
        proj = (cam_ops.project_fisheye if scene.fisheye
                else cam_ops.project_pinhole)
        meas = np.empty((N, C, sk.N_MARKERS, 2))
        for c in range(C):
            meas[:, c] = np.asarray(
                proj(markers, scene.K[c], scene.D[c], scene.R[c],
                     scene.t[c]))
    meas = meas + rng.normal(scale=noise_px, size=meas.shape)
    out_mask = rng.uniform(size=meas.shape[:3]) < outlier_frac
    meas[out_mask] += rng.normal(scale=outlier_px, size=(out_mask.sum(), 2))
    likelihood = np.clip(rng.uniform(0.6, 1.0, size=(N, C, sk.N_MARKERS)),
                         0.0, 1.0)
    drop = rng.uniform(size=likelihood.shape) < drop_frac
    likelihood[drop] = rng.uniform(0.0, dlc_thresh, size=drop.sum())
    if occlusion_rate > 0 or confusion_rate > 0:
        meas, likelihood = corrupt_dlc(
            meas, likelihood, rng, occlusion_rate=occlusion_rate,
            confusion_rate=confusion_rate, dlc_thresh=dlc_thresh)
    return SyntheticTrial(q_gt=q_gt, markers_gt=markers,
                          meas=meas[..., None], likelihood=likelihood[..., None],
                          scene=scene, subject_name=subject_name)


def write_trial_dir(trial: SyntheticTrial, root_dir: str, data_path: str,
                    monocular_cam: int = 0, write_ppm: bool = False,
                    ground_plane_height: float = 0.0) -> str:
    """Materialize a synthetic trial as an AcinoSet-style directory tree:
    dlc/cam*.h5|.csv, extrinsic_calib/N_cam_scene_sba.json, metadata.json —
    the exact inputs the file-based pipeline (pipeline.estimator) consumes."""
    from . import io as dio

    data_dir = os.path.join(root_dir, data_path)
    os.makedirs(data_dir, exist_ok=True)
    N, C = trial.meas.shape[:2]
    for c in range(C):
        dio.save_dlc_table(
            os.path.join(data_dir, "dlc", f"cam{c + 1}.h5"),
            trial.meas[:, c, :, :, 0], trial.likelihood[:, c, :, 0])
    if write_ppm:
        from . import ppm as ppm_mod
        for c in range(C):
            pose, lik, pws = ppm_mod.synthesize_ppm(
                trial.meas[:, c, :, :, 0], trial.likelihood[:, c, :, 0],
                seed=c)
            ppm_mod.save_ppm_pickle(
                os.path.join(data_dir, "dlc_pw", f"cam{c + 1}.pickle"),
                pose, lik, pws)
    dio.save_scene(
        os.path.join(data_dir, "extrinsic_calib",
                     f"{C}_cam_scene_sba.json"),
        trial.scene.K, trial.scene.D, trial.scene.R, trial.scene.t,
        trial.scene.cam_res)
    dio.save_metadata(data_dir, start_frame=0, end_frame=N,
                      monocular_cam=monocular_cam,
                      ground_plane_height=ground_plane_height)
    return data_dir


def gated_weights(trial: SyntheticTrial, dlc_thresh: float = 0.5,
                  kinetic_dataset: bool = False) -> np.ndarray:
    """(N, C, 24, W) measurement weights: 1/R gated by likelihood > thresh
    (reference init_meas_weights, acinoset_misc.py:211-233)."""
    w_rows = noise_tables.measurement_weights(
        trial.meas.shape[-1], kinetic_dataset)          # (W, 24)
    w = np.einsum("wl,nclw->nclw", w_rows,
                  (trial.likelihood > dlc_thresh).astype(float))
    return w
