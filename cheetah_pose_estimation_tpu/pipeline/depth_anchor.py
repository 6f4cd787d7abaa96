"""Monocular ground-plane depth correction (analytic warm-start shift).

The dominant monocular reconstruction error is global translation along the
(near-horizontal) camera viewing ray: the reprojection cost is flat along
the ray, so the solver settles wherever the body-scale depth init put it
(VERDICT r2: monocular MPE 243 mm vs reference 264 while MPJPE is 2x
better). The reference only ever confronts that error indirectly, through
its physics stage's foot constraints (``foot.ground_plane_height``,
acinoset_opt.py:500); the calibrated plane itself is a *direct* depth
measurement available to the kinematic stages: a stance foot hovering
``gap`` metres above the plane betrays a depth error of roughly
``gap / |ray_z|`` metres along the ray — a ~7x lever on these scenes
(measured ray_z ~ -0.13).

Gradient descent cannot traverse that flat valley in useful time, so the
correction is applied analytically to the solved trajectory:

1. detect stance windows from the solved kinematics
   (pipeline.contacts.contact_detection, per-foot-relative gating);
2. per frame, measure the stance-feet height gap to the calibrated plane;
3. convert the per-window minimum gaps to implied depth shifts along the
   camera ray and take their robust minimum — "at least one stance foot
   truly touches the plane" (hovering windows only bias samples upward,
   see fit_shift);
4. translate the base trajectory by that constant shift along the
   per-frame rays;
5. polish with a short anchored kinematic solve (the stance-z / hinge /
   no-slip terms of solver.kinematic.KinematicConfig) to restore
   measurement consistency around the new depth.

Steps 1-4 are cheap host numpy; step 5 is one short vmapped LM run.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..models import skeleton as sk
from ..models.params import SubjectParams
from ..utils.device import host_cpu

_PAW_IDX = np.array([sk.MARKERS.index(m) for m in
                     ("l_front_paw", "r_front_paw",
                      "l_back_paw", "r_back_paw")])

# feet order must match solver.kinematic._PAW_IDX / dynamics.eom.FOOT_NAMES
FOOT_ORDER = ("HFL", "HFR", "HBL", "HBR")

# anchored-polish weights (solver.kinematic.KinematicConfig): the stance-z
# pull is deliberately softer than the measurement term so a bad stance
# window cannot drag a good reconstruction; the hinge only guards against
# penetration; no-slip pins global translation during stance.
POLISH_CFG = dict(ground_weight=2e3, penetration_weight=1e4,
                  noslip_weight=3e3)
POLISH_STAGES = ((1.0, 30),)


def detect_stance(q: np.ndarray, subject: SubjectParams, fps: float,
                  ground_z: float = 0.0) -> np.ndarray:
    """(N, 4) stance indicator from a solved trajectory.

    Contact detection runs per-foot-relative (each foot's heights measured
    against its own minimum), so a global depth error — exactly what this
    module corrects — does not blind it."""
    from ..solver import kinetic as kn
    from . import contacts as cmod

    q = np.asarray(q, np.float64)
    N = q.shape[0]
    dq = np.zeros_like(q)
    dq[1:] = (q[1:] - q[:-1]) * fps
    # host prep stays on the host CPU: on a tunneled accelerator backend
    # each distinct-shape scrap op costs a compile round-trip
    with host_cpu():
        com = np.asarray(sk.com_position(q, subject))
        com_v = np.diff(com, axis=0) * fps
        speed = (float(np.mean(np.linalg.norm(com_v, axis=1)))
                 if N > 1 else 0.0)
        try:
            contacts, _ = cmod.contact_detection(
                q, dq, subject, 0, speed, fps, ground_plane_height=ground_z,
                per_foot_relative=True)
        except (ValueError, IndexError):
            return np.zeros((N, 4))
        stance = kn.stance_matrix(contacts, 0, N)
        return kn.prune_stance(stance, q, subject, 1.0 / fps)


def paw_heights(q: np.ndarray, subject: SubjectParams) -> np.ndarray:
    """(N, 4) paw-marker z along a trajectory (host CPU pinned)."""
    with host_cpu():
        return np.asarray(sk.fk_markers(np.asarray(q, np.float64),
                                        subject))[:, _PAW_IDX, 2]


def touchdown_samples(q: np.ndarray, subject: SubjectParams,
                      stance: np.ndarray, ground_z: float
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-stance-window touchdown gaps: (frame_idx, gap, weight) arrays.

    A stance foot hovers above the plane early/late in its window (measured
    ~+0.04 m at ground truth — a ~0.3 m depth bias through the ray lever),
    but at its within-window MINIMUM it is flat on the ground. Each
    consecutive stance run of each foot therefore contributes one nearly
    bias-free plane sample: (argmin frame, min gap), weighted by window
    length."""
    paws = paw_heights(q, subject)
    w = np.asarray(stance, np.float64)
    ts, gaps, ws = [], [], []
    for f in range(4):
        on = w[:, f] > 0
        if not on.any():
            continue
        # consecutive runs of stance
        idx = np.flatnonzero(on)
        splits = np.flatnonzero(np.diff(idx) > 1)
        for run in np.split(idx, splits + 1):
            rel = paws[run, f] - ground_z
            k = int(np.argmin(rel))
            ts.append(float(run[k]))
            gaps.append(float(rel[k]))
            ws.append(float(len(run)))
    return np.asarray(ts), np.asarray(gaps), np.asarray(ws)


def camera_ray(q: np.ndarray, R_cam: np.ndarray,
               t_cam: np.ndarray) -> np.ndarray:
    """(N, 3) unit rays from the camera centre through the per-frame base
    position. World-to-camera convention x_cam = R x + t, so the centre is
    c = -R^T t (reference extrinsics, acinoset_misc.py:1496-1515)."""
    t = np.asarray(t_cam, np.float64).reshape(3)
    c = -np.asarray(R_cam, np.float64).T @ t
    d = np.asarray(q, np.float64)[:, :3] - c[None]
    n = np.linalg.norm(d, axis=1, keepdims=True)
    return d / np.maximum(n, 1e-9)


def fit_shift(ts: np.ndarray, gaps: np.ndarray, ws: np.ndarray,
              ray_z: np.ndarray, min_ray_z: float = 0.02,
              max_shift_m: float = 1.5,
              deep_pen_m: float = 0.05,
              min_shift_m: float = 0.35) -> np.ndarray:
    """Constant per-trial shift magnitude along the ray (metres, +away from
    the camera) implied by the touchdown gaps: s_i = gap_i / (-ray_z_i).

    The window samples are asymmetrically informative:

    * POSITIVE gaps (hovering feet) are one-sidedly biased UP — a window
      whose foot only hovered (flick trials, partial-load feet, measured
      gaps up to +0.07 m at ground truth) inflates its sample, while a
      window whose foot truly reached the plane measures the depth error
      exactly. The right estimator over positive samples is therefore the
      LOWEST — "at least one stance foot touches the ground" — with one
      guard: a lowest sample > 0.5 m below the second lowest is an
      artifact and the second lowest is used.
    * NEGATIVE gaps (feet below the plane) are physically impossible for
      a real stance, so shallow penetration is POSE NOISE, not depth
      evidence — and the ~7x ray lever amplifies centimetres of paw-z
      error into decimetres of toward-camera shift. Round-4 measured
      failure: four noisy samples of -0.01..-0.08 m chose a -0.74 m shift
      and took a flick trial from 186 to 637 mm MPE while the anchored
      objective gate (blind along the ray) accepted it. Negative samples
      are therefore DROPPED; only when every sample's GAP penetrates
      deeper than the pose-noise floor (all gaps <= -deep_pen_m, a
      genuinely too-far reconstruction) is a toward-camera correction
      applied — then from the MOST-negative sample: the hover bias is
      upward regardless of the shift's sign, so the deepest window is
      still the one whose foot truly reached the plane (with the same
      0.5 m second-lowest outlier guard as the positive branch).

    Mixed shallow evidence (some hover, some penetrate) means the plane
    is effectively being touched already -> positive samples only; all-
    shallow-negative evidence -> no correction. Samples whose ray is too
    vertical carry no depth lever and are dropped. Returns zeros (no
    correction) without at least 2 samples.

    ``min_shift_m`` is the channel's NOISE FLOOR: paw-z pose noise of a
    few centimetres times the ~7x ray lever is ~0.3-0.4 m of spurious
    shift, so corrections smaller than that are indistinguishable from
    noise and are suppressed (round-4 measured on the bench scenes: true
    ray errors of 0.03-0.27 m with implied-shift evidence of 0.05-0.28 m
    in the WRONG direction — applying them took data-driven MPE from 182
    to 232 mm). The anchor is a coarse-error rescue, not a fine-depth
    estimator; sub-floor depth belongs to the polish's measurement-
    coupled stance terms, not to an open-loop shift."""
    N = ray_z.shape[0]
    lever = -np.asarray(ray_z, np.float64)
    ti = np.clip(np.asarray(ts, int), 0, N - 1)
    ok = (np.asarray(ws) > 0) & (np.abs(lever[ti]) > min_ray_z)
    if ok.sum() < 2:
        return np.zeros(N)
    g_ok = gaps[ok]
    s_all = g_ok / lever[ti[ok]]
    pos = s_all[s_all >= 0.0]
    neg = s_all[s_all < 0.0]
    if pos.size:
        s = np.sort(pos)
        s_hat = s[1] if (s.size > 1 and s[0] < s[1] - 0.5) else s[0]
    elif neg.size and np.all(g_ok <= -deep_pen_m):
        s = np.sort(neg)
        s_hat = s[1] if (s.size > 1 and s[0] < s[1] - 0.5) else s[0]
    else:
        return np.zeros(N)
    if abs(s_hat) < min_shift_m:
        return np.zeros(N)
    return np.full(N, np.clip(s_hat, -max_shift_m, max_shift_m))


def scale_depth_shift(q: np.ndarray, subject: SubjectParams,
                      meas: np.ndarray, weight: np.ndarray,
                      K: np.ndarray, D_dist: np.ndarray,
                      R_cam: np.ndarray, t_cam: np.ndarray,
                      fisheye: bool = True,
                      min_markers: int = 8,
                      min_frames: int = 16,
                      max_spread_ratio: float = 0.6,
                      max_shift_m: float = 1.5) -> float:
    """Per-trial depth shift (metres along the viewing ray, + away from the
    camera) implied by APPARENT BODY SCALE.

    The foot-height channel (fit_shift) cannot separate shallow
    toward-camera depth error from paw-pose noise — its ~7x ray lever
    amplifies centimetres of paw-z error into decimetres of shift, so
    sub-0.35 m corrections are suppressed (round-4 noise floor). Body
    scale is an independent, much better-conditioned channel for exactly
    that shallow regime: with the skeleton's segment lengths fixed by the
    subject parameters, the projected marker spread scales as 1/depth, so

        size_meas / size_rec = d_rec / d_true
        shift = d_true - d_rec = d_rec * (size_rec / size_meas - 1)

    Per frame the 'size' is the weighted RMS spread of the likelihood-
    gated detections about their centroid vs the same spread of the
    reprojected FK markers; the per-frame implied shifts are combined by
    a length-weighted median (pose error perturbs single frames by a few
    percent but is near-zero-mean across a trial, unlike the one-sided
    hover bias of the foot channel). Frames with fewer than
    ``min_markers`` gated detections carry no scale signal and are
    dropped; a trial needs ``min_frames`` surviving frames and a
    between-frame spread (robust MAD) below ``max_spread_ratio`` x the
    median magnitude — wildly disagreeing frames mean pose error
    dominates the scale signal and the channel abstains (returns 0.0).

    The reference has no counterpart — its monocular depth error simply
    persists (BASELINE.md dd MPE 156.6 mm is dominated by it); this
    channel recovers the shallow corrections the round-4 penetration
    guard deliberately forfeited (VERDICT r4 ask #5)."""
    from ..ops import camera as cam_ops

    q = np.asarray(q, np.float64)
    N = q.shape[0]
    with host_cpu():
        pts = np.asarray(sk.fk_markers(q, subject))            # (N, 24, 3)
        proj = (cam_ops.project_fisheye if fisheye
                else cam_ops.project_pinhole)
        uv_rec = np.asarray(proj(pts.reshape(-1, 3), K, D_dist, R_cam,
                                 t_cam)).reshape(N, -1, 2)
    meas = np.asarray(meas, np.float64)       # (N, L, 2, W) or (N, L, 2)
    w = np.asarray(weight, np.float64)        # (N, L, W) or (N, L)
    if meas.ndim == 4:                        # collapse the W axis: best det
        wbest = w.argmax(axis=-1)
        meas = np.take_along_axis(
            meas, wbest[:, :, None, None], axis=-1)[..., 0]
        w = np.max(w, axis=-1)
    t = np.asarray(t_cam, np.float64).reshape(3)
    c = -np.asarray(R_cam, np.float64).T @ t
    d_rec = np.linalg.norm(q[:, :3] - c[None], axis=1)         # (N,)
    shifts, wts = [], []
    for i in range(N):
        m = w[i] > 0
        if m.sum() < min_markers:
            continue
        wm = w[i][m]
        mu_m = (wm[:, None] * meas[i][m]).sum(0) / wm.sum()
        mu_r = (wm[:, None] * uv_rec[i][m]).sum(0) / wm.sum()
        s_m = np.sqrt((wm[:, None] * (meas[i][m] - mu_m) ** 2).sum()
                      / wm.sum())
        s_r = np.sqrt((wm[:, None] * (uv_rec[i][m] - mu_r) ** 2).sum()
                      / wm.sum())
        if s_m < 1e-6 or s_r < 1e-6:
            continue
        shifts.append(d_rec[i] * (s_r / s_m - 1.0))
        wts.append(float(m.sum()))
    if len(shifts) < min_frames:
        return 0.0
    shifts = np.asarray(shifts)
    wts = np.asarray(wts)
    order = np.argsort(shifts)
    cw = np.cumsum(wts[order])
    med = float(shifts[order[np.searchsorted(cw, 0.5 * cw[-1])]])
    mad = float(np.median(np.abs(shifts - med)))
    if mad > max_spread_ratio * max(abs(med), 1e-9):
        return 0.0
    return float(np.clip(med, -max_shift_m, max_shift_m))


def scale_shift_sign(q: np.ndarray, subject: SubjectParams,
                     meas: np.ndarray, weight: np.ndarray,
                     K: np.ndarray, D_dist: np.ndarray,
                     R_cam: np.ndarray, t_cam: np.ndarray,
                     fisheye: bool = True,
                     dead_zone_m: float = 0.05) -> float:
    """Direction vote (-1/0/+1) of the body-scale channel, for vetoing
    depth-line-scan picks that contradict it (see make_depth_linescan).

    The scale channel's magnitude is attenuated trial-dependently (the
    solved pose absorbs part of the scale mismatch), but its median's SIGN
    is reliable once clear of a +-dead_zone_m dead zone (measured on the
    bench set: sign correct on every trial with |median| > 0.05 m)."""
    med = scale_median(q, subject, meas, weight, K, D_dist, R_cam, t_cam,
                       fisheye=fisheye)
    if abs(med) <= dead_zone_m:
        return 0.0
    return float(np.sign(med))


def scale_median(q: np.ndarray, subject: SubjectParams,
                 meas: np.ndarray, weight: np.ndarray,
                 K: np.ndarray, D_dist: np.ndarray,
                 R_cam: np.ndarray, t_cam: np.ndarray,
                 fisheye: bool = True) -> float:
    """Raw signed body-scale median (metres along the ray) — no spread
    gate, no noise floor. Feed to make_depth_linescan's ``scale_med``:
    the scan uses its SIGN (veto) and its magnitude (candidate bound);
    the magnitude is attenuated toward zero by pose re-adaptation, never
    inflated, which is exactly what a bound needs."""
    return scale_depth_shift(q, subject, meas, weight, K, D_dist, R_cam,
                             t_cam, fisheye=fisheye, max_spread_ratio=1e9,
                             min_frames=8)


def make_depth_linescan(subject: SubjectParams, dtype=None,
                        shifts: Tuple[float, ...] = (-0.5, -0.4, -0.3,
                                                     -0.2, -0.1, 0.0,
                                                     0.1),
                        stages: Tuple = ((1.0, 60),),
                        finish_stages: Optional[Tuple] = None,
                        margin: float = 0.01):
    """Monocular depth line-scan: re-solve at candidate depths, keep the
    clear winner.

    The reprojection objective is nearly flat along the viewing ray, so
    the LM solver parks wherever the init put it — but it is NOT exactly
    flat: at the wrong depth the fixed-size skeleton reprojects at the
    wrong scale, and once the pose re-adapts to each candidate depth the
    remaining cost difference is genuine depth evidence. The scan
    evaluates that evidence directly: shift the whole trajectory by each
    candidate offset along the per-frame camera rays, re-anneal briefly
    (final-stage schedule), and per trial accept the best candidate ONLY
    if its re-solved prior-free cost beats the zero-shift lane's by more
    than ``margin`` (relative); otherwise the INPUT trajectory ships
    unchanged (the zero lane exists purely as the cost baseline — its
    re-solve must never replace a prior-polished input). An optional
    per-trial ``scale_med`` (from scale_median) constrains candidates to
    agree with the body-scale channel in sign and rough magnitude.

    Round-5 measured (bench set, CPU): composed after the gated
    data-driven stage this takes mean monocular MPE 195 -> ~140 mm and
    rescues every base-anchor-slack drift the cost-ratio prior gate
    misses. The judge config is PRIOR-FREE — a GMM judge tilts the depth
    decision toward manifold poses and mis-picks (measured mean 229 mm).

    Returns ``scan(q_in, batched, rays, scale_med=None) ->
    (q_out (B,N,54) jnp, shift (B,) np)``. One compiled vmapped solve of
    ``len(shifts) * B`` lanes; reuse the returned closure across calls.
    """
    import jax
    import jax.numpy as jnp

    from ..solver import kinematic as kin

    if dtype is None:
        dtype = jnp.float32
    fte = kin.KinematicFTE(
        kin.KinematicConfig(fisheye=True, robust=True), subject)
    # fixed-length scan driver: the vmapped lanes synchronize to the
    # slowest lane under a while-driver anyway, and the single-stage
    # fixed driver compiles half the cost body (see make_solver)
    run = fte.make_solver(stages=stages, driver="fixed")
    vrun = jax.jit(jax.vmap(run))
    # optional longer re-anneal of accepted winners (probe/finish split).
    # None (production default): the pipelines re-polish accepted winners
    # with the full prior solver at the corrected depth anyway
    # (pipeline/batched.py), which supersedes a prior-free finish — a
    # second free re-anneal was measured to change nothing there.
    vfinish = None
    if finish_stages is not None:
        vfinish = jax.jit(jax.vmap(fte.make_solver(stages=finish_stages)))
    offs = tuple(float(s) for s in shifts)
    ZI = offs.index(0.0)
    Kn = len(offs)

    def scan(q_in, batched, rays, scale_med=None,
             dead_zone_m: float = 0.05):
        q_in = jnp.asarray(q_in, dtype)
        raysb = jnp.asarray(np.asarray(rays), dtype)
        B = q_in.shape[0]
        qks = jnp.concatenate([q_in.at[:, :, :3].add(s * raysb)
                               for s in offs])
        rep = jax.tree.map(lambda x: jnp.concatenate([x] * Kn), batched)
        st = vrun(qks, rep)
        cost = np.asarray(st.cost, np.float64).reshape(Kn, B)
        c = np.where(np.isfinite(cost), cost, np.inf)
        offv = np.asarray(offs)
        if scale_med is not None:
            # body-scale consistency constraints, active when the scale
            # channel's |median| clears its dead zone: candidate shifts
            # must AGREE IN SIGN with the channel and stay within
            # 2x|median| + 0.15 m (the channel's magnitude is attenuated
            # toward zero by pose re-adaptation, never inflated — so a
            # pick far beyond it is landscape noise, not depth; measured:
            # an unbounded -0.4 pick on a half-rescued pose-broken trial
            # cost 200 -> 456 mm while its scale median read -0.099)
            med = np.asarray(scale_med, np.float64)
            act = np.abs(med) > dead_zone_m
            sign_ok = (offv[:, None] == 0.0) \
                | (np.sign(offv)[:, None] == np.sign(med)[None, :])
            mag_ok = np.abs(offv)[:, None] \
                <= 2.0 * np.abs(med)[None, :] + 0.15
            allowed = ~act[None, :] | (sign_ok & mag_ok)
            c = np.where(allowed, c, np.inf)
        best = np.argmin(c, axis=0)
        thr = c[ZI] - margin * np.abs(c[ZI])
        accept = c[best, np.arange(B)] < thr
        # interior-valley requirement: a best lane at the grid edge is not
        # bracketed — on pose-broken trials the landscape is multi-basin
        # noise and an edge pick over-shifts catastrophically
        accept &= (best > 0) & (best < Kn - 1)
        qsol = np.asarray(st.q, np.float64).reshape(
            (Kn, B) + st.q.shape[1:])
        q_np = np.asarray(q_in, np.float64)
        shift_out = np.where(accept,
                             np.asarray([offs[b] for b in best]), 0.0)
        if not accept.any():
            return jnp.asarray(q_np, dtype), shift_out
        qf = qsol[best, np.arange(B)]
        if vfinish is not None:
            # finish the accepted winners (the vmapped solve runs every
            # lane; non-accepted trials keep their INPUT unchanged)
            stf = vfinish(jnp.asarray(qf, dtype), batched)
            qf = np.asarray(stf.q, np.float64)
        out = np.where(accept[:, None, None], qf, q_np)
        return jnp.asarray(out, dtype), shift_out

    return scan


def ray_depth_correction(q: np.ndarray, subject: SubjectParams, fps: float,
                         ground_z: float, R_cam: np.ndarray,
                         t_cam: np.ndarray,
                         stance: Optional[np.ndarray] = None
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Analytic monocular depth correction of a solved trajectory.

    Returns (q_corrected, stance (N,4), shift (N,) metres). ``stance`` may
    be passed in to reuse an existing detection. A zero shift (no stance
    evidence / no ray lever) returns q unchanged."""
    q = np.asarray(q, np.float64)
    if stance is None:
        stance = detect_stance(q, subject, fps, ground_z)
    ts, gaps, ws = touchdown_samples(q, subject, stance, ground_z)
    ray = camera_ray(q, R_cam, t_cam)
    shift = fit_shift(ts, gaps, ws, ray[:, 2])
    q_out = q.copy()
    q_out[:, :3] = q[:, :3] + shift[:, None] * ray
    return q_out, stance, shift
