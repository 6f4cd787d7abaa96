"""Trajectory initialisation from 2D detections.

Mirrors the reference ``create_trajectory_estimate`` + state init
(``acinoset_misc.py:381-456``, ``acinoset_opt.py:570-583``): triangulate the
spine marker (pairwise multi-view DLT, or single-view ray at a nominal 3 m
depth for monocular), smooth x/y/z with cubic splines, estimate yaw from the
smoothed planar velocity, and initialise every link's psi to the heading with
all other angles zero. Host-side (numpy/scipy) data preparation — runs once
per trial before the jitted solver.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.interpolate import UnivariateSpline

from ..models.params import SubjectParams
from ..models.skeleton import LINK_NAMES, MARKERS
from ..ops import camera as cam_ops
from ..utils.device import host_cpu

SPINE = MARKERS.index("spine")


def triangulate_spine_multiview(meas: np.ndarray, weight: np.ndarray,
                                K, D, R, t, fisheye: bool = True
                                ) -> np.ndarray:
    """Mean of pairwise two-view triangulations of the spine marker.

    Args:
      meas: (N, C, L, 2[, W]) pixel detections (W>=1: base predictions used).
      weight: (N, C, L[, W]) weights; 0 marks gated-out detections.
    Returns:
      (N, 3) spine positions with NaN where no pair was available.
    """
    if meas.ndim == 5:
        meas = meas[..., 0]
        weight = weight[..., 0]
    N, C = meas.shape[:2]
    undist = cam_ops.undistort_fisheye if fisheye else cam_ops.undistort_pinhole
    with host_cpu():
        ab = np.stack([np.asarray(undist(meas[:, c, SPINE], K[c], D[c]))
                       for c in range(C)], axis=1)    # (N, C, 2)
        ok = weight[:, :, SPINE] > 0                  # (N, C)
        acc = np.zeros((N, 3))
        cnt = np.zeros(N)
        for i in range(C):
            j = (i + 1) % C
            pair_ok = ok[:, i] & ok[:, j]
            if not pair_ok.any():
                continue
            X = np.asarray(cam_ops.triangulate_dlt(
                ab[pair_ok, i], ab[pair_ok, j], R[i], t[i], R[j], t[j]))
            acc[pair_ok] += X
            cnt[pair_ok] += 1
    out = np.full((N, 3), np.nan)
    nz = cnt > 0
    out[nz] = acc[nz] / cnt[nz, None]
    return out


NECK_BASE = MARKERS.index("neck_base")
TAIL_BASE = MARKERS.index("tail_base")


def estimate_monocular_depth(meas: np.ndarray, weight: np.ndarray,
                             cam_idx: int, K, D, fisheye: bool,
                             body_axis_m: float) -> np.ndarray:
    """Per-frame camera depth of the animal from its apparent body scale.

    The reference back-projects the spine to a hard-coded 3 m camera depth
    (``acinoset_misc.py:416``), which breaks when the camera stands farther
    away. Instead we use the known skeleton size: the neck_base-to-tail_base
    separation in undistorted normalized coordinates is ~ L_body / depth for
    the side-on viewing geometry of these setups, giving a robust per-frame
    depth estimate (median-filled where detections are missing).
    """
    undist = cam_ops.undistort_fisheye if fisheye else cam_ops.undistort_pinhole
    with host_cpu():
        ab = np.asarray(undist(meas[:, cam_idx, [NECK_BASE, TAIL_BASE]],
                               K[cam_idx], D[cam_idx]))  # (N, 2, 2)
    sep = np.linalg.norm(ab[:, 0] - ab[:, 1], axis=1)
    ok = (weight[:, cam_idx, NECK_BASE] > 0) & \
        (weight[:, cam_idx, TAIL_BASE] > 0) & (sep > 1e-6)
    depth = np.full(meas.shape[0], np.nan)
    depth[ok] = body_axis_m / sep[ok]
    if np.isfinite(depth).any():
        # foreshortening (pitch/yaw of the trunk) only ever *shrinks* the
        # apparent axis, biasing per-frame estimates long; a low percentile
        # over the stride (where the axis passes near-perpendicular) is a
        # nearly unbiased global depth.
        depth[:] = np.nanpercentile(depth, 20.0)
    else:
        depth[:] = 3.0  # reference fallback
    return depth


def spine_from_single_view(meas: np.ndarray, weight: np.ndarray, cam_idx: int,
                           K, D, R, t, fisheye: bool = True,
                           dist_to_plane: Optional[float] = None,
                           body_axis_m: float = 0.75) -> np.ndarray:
    """Monocular: back-project the spine pixel along its camera ray.

    By default the per-frame depth comes from the apparent body scale
    (``estimate_monocular_depth``); pass ``dist_to_plane`` for the reference's
    fixed-depth behaviour (triangulate_points_single_img, 3 m,
    acinoset_misc.py:414-423).
    """
    if meas.ndim == 5:
        meas = meas[..., 0]
        weight = weight[..., 0]
    undist = cam_ops.undistort_fisheye if fisheye else cam_ops.undistort_pinhole
    with host_cpu():
        ab = np.asarray(undist(meas[:, cam_idx, SPINE], K[cam_idx],
                               D[cam_idx]))
    if dist_to_plane is not None:
        depth = np.full(meas.shape[0], float(dist_to_plane))
    else:
        depth = estimate_monocular_depth(meas, weight, cam_idx, K, D, fisheye,
                                         body_axis_m)
    with host_cpu():
        X = np.stack([
            np.array(cam_ops.backproject_to_distance(
                ab[i], float(depth[i]), R[cam_idx], t[cam_idx]))
            for i in range(meas.shape[0])])
    ok = weight[:, cam_idx, SPINE] > 0
    X[~ok] = np.nan
    return X


def smooth_and_head(spine: np.ndarray, linear: bool = False):
    """Cubic-spline smooth the (possibly NaN-holed) spine track and estimate
    the yaw from planar velocity (pi + atan2, reference assumption that the
    cheetah runs in +x, acinoset_misc.py:449-454)."""
    N = spine.shape[0]
    fr = np.arange(N, dtype=float)
    ok = np.isfinite(spine).all(axis=1)
    k = 1 if linear else 3
    if ok.sum() <= k:
        sm = np.repeat(np.nanmean(spine, axis=0, keepdims=True), N, axis=0)
        sm = np.nan_to_num(sm)
    else:
        sm = np.stack([
            UnivariateSpline(fr[ok], spine[ok, i], k=k)(fr)
            for i in range(3)], axis=1)
    d = np.gradient(sm[:, :2], axis=0)
    psi = np.pi + np.arctan2(d[:, 1], d[:, 0])
    # atan2's branch cut: a heading near 0 (mod 2pi) flips psi by 2pi
    # between adjacent frames — FK-identical, but it injects ~2pi*fps of
    # fake yaw rate into the constant-acceleration motion model and the
    # solver starts in (and can stay in) a wound-up basin. Unwrap along
    # time and re-center on the principal branch.
    psi = np.unwrap(psi)
    psi -= 2.0 * np.pi * np.round(np.median(psi) / (2.0 * np.pi))
    return sm, psi


def initial_q(spine_smooth: np.ndarray, psi: np.ndarray,
              subject: SubjectParams) -> np.ndarray:
    """Assemble q0: base centre half a body-length behind the spine marker
    along the running direction, all psi set to the heading, everything else
    zero (reference acinoset_opt.py:574-583 with the spine/base offset of
    acinoset_misc.py:424)."""
    N = spine_smooth.shape[0]
    q0 = np.zeros((N, 54))
    q0[:, :3] = spine_smooth
    # reference adds +length/2 to x only (assumes +x running direction)
    q0[:, 0] += subject.length[0] / 2.0
    for i in range(len(LINK_NAMES)):
        q0[:, 5 if i == 0 else 3 * i + 5] = psi
    return q0


def initialize_trajectory(meas: np.ndarray, weight: np.ndarray, K, D, R, t,
                          subject: SubjectParams, fisheye: bool = True,
                          cam_idx: Optional[int] = None,
                          kinetic_dataset: bool = False) -> np.ndarray:
    """Full init path: returns q0 (N, 54)."""
    if cam_idx is None:
        spine = triangulate_spine_multiview(meas, weight, K, D, R, t, fisheye)
    else:
        body_axis = float(subject.length[0] + subject.length[1])
        spine = spine_from_single_view(meas, weight, cam_idx, K, D, R, t,
                                       fisheye, body_axis_m=body_axis)
    sm, psi = smooth_and_head(spine, linear=kinetic_dataset)
    return initial_q(sm, psi, subject)
