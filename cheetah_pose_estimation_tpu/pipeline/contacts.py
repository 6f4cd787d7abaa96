"""Contact detection and ground-reaction-force synthesis.

Port of the reference's heuristic contact pipeline
(``acinoset_misc.py:745-943,2033-2057``): a stance-time linear model from
Hudson's cheetah data, a foot-height threshold + vertical-velocity
zero-crossing test, argmin-window stance placement, leading/trailing limb
assignment (rotary gallop), half-sine Fz + spline Fx force synthesis, and the
``autogen-contact.json`` / ``data_synth.h5`` artifact formats.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..dynamics.eom import FOOT_NAMES, foot_points
from ..models.params import SubjectParams
from ..utils.device import host_cpu
from . import grf_io


class SimpleLinearModel:
    """y = m x + c least-squares line (reference acinoset_misc.py:68-81)."""

    def __init__(self, pts):
        x, y = zip(*pts)
        A = np.vstack([x, np.ones(len(x))]).T
        self.m, self.c = np.linalg.lstsq(A, y, rcond=None)[0]

    def predict(self, x: float) -> float:
        return self.m * x + self.c


STANCE_TIME_MODEL = SimpleLinearModel([[9.0, 0.09], [14.0, 0.06]])
# peak vertical force (body weights) vs speed, per limb role
MODEL_LFL = SimpleLinearModel([[9.0, 2.0], [15.0, 1.8]])     # leading fore
MODEL_LHL = SimpleLinearModel([[9.0, 2.1], [15.0, 2.6]])     # leading hind
MODEL_NLFL = SimpleLinearModel([[9.5, 2.1], [15.0, 2.0]])    # trailing fore
MODEL_NLHL = SimpleLinearModel([[9.0, 1.7], [15.0, 2.5]])    # trailing hind

HEIGHT_THRESHOLD = 0.05


def positive_zero_crossings(x: np.ndarray) -> Tuple[int, List[int]]:
    """Indices around -/+ crossings (reference acinoset_misc.py:2033-2046)."""
    count = 0
    args: List[int] = []
    x = x[np.nonzero(x)]
    for i in range(1, len(x)):
        if x[i - 1] < 0 and x[i] > 0:
            count += 1
            args.extend([i + 2, i + 1, i, i - 1, i - 2])
    return count, args


def group_by_consecutive_values(x) -> List[np.ndarray]:
    spl = [0] + [i for i in range(1, len(x)) if x[i] - x[i - 1] > 1] + [None]
    return [x[b:e] for b, e in [(spl[i - 1], spl[i])
                                 for i in range(1, len(spl))]]


def foot_kinematics(q: np.ndarray, dq: np.ndarray,
                    subject: SubjectParams) -> Tuple[np.ndarray, np.ndarray]:
    """(heights (N, 4), velocities (N, 4, 3)) of the feet along a trajectory."""
    import jax.numpy as jnp

    with host_cpu():
        fp = lambda qq: foot_points(qq, subject)
        pts, vel = jax.jvp(jax.vmap(fp), (jnp.asarray(q),),
                           (jnp.asarray(dq),))
        return np.asarray(pts[..., 2]), np.asarray(vel)


def estimate_ground_height(q: np.ndarray, subject: SubjectParams) -> float:
    """Ground elevation estimate for a trajectory: the minimum foot height.

    The reference carries a hand-measured ``ground_plane_height`` per trial
    in metadata.json (acinoset_opt.py:464-472) — AcinoSet world frames do
    NOT put the ground at z=0 (2017 trials sit near +0.1 m, 2019 near
    -0.1 m). For synthetic worlds derived from reference solutions the feet
    graze the true ground during stance, so the minimum is an honest stand-in
    for the measured value."""
    z, _ = foot_kinematics(q, np.zeros_like(q), subject)
    return float(np.min(z))


def contact_detection(q: np.ndarray, dq: np.ndarray, subject: SubjectParams,
                      start_frame: int, speed: float, fps: float,
                      data_dir: Optional[str] = None,
                      ground_plane_height: float = 0.0,
                      foot_kin: Optional[Tuple[np.ndarray, np.ndarray]]
                      = None,
                      per_foot_relative: bool = False) -> Tuple[Dict, Dict]:
    """Heuristic stance detection (reference ``contact_detection``,
    acinoset_misc.py:745-856). Returns (contacts, contacts_tmp) and, when
    ``data_dir`` is given, writes grf/autogen-contact[-02].json.
    ``foot_kin`` optionally supplies precomputed (heights, velocities) so a
    batch caller can evaluate the FK for many trials in one padded call.

    ``per_foot_relative`` gates the height test against each foot's own
    trajectory minimum instead of the calibrated plane — translation-
    invariant timing for monocular warm starts whose depth error shifts
    feet off the plane (the window *timing* comes from the height argmin +
    velocity zero crossing, both translation-invariant; only the gate
    needs a plane)."""
    stance_time_fe = round(STANCE_TIME_MODEL.predict(speed) * fps)
    mid_way = stance_time_fe // 2
    is_even = (stance_time_fe % 2) == 0
    heights, vels = foot_kin if foot_kin is not None \
        else foot_kinematics(q, dq, subject)
    N = q.shape[0]
    contacts: Dict[str, Optional[List]] = {}
    contacts_tmp: Dict[str, Optional[List]] = {}
    for i, name in enumerate(FOOT_NAMES):
        fh = heights[:, i]
        gate = (float(fh.min()) if per_foot_relative
                else ground_plane_height) + HEIGHT_THRESHOLD
        arg_h = np.where(fh < gate)[0]
        groups = group_by_consecutive_values(arg_h)
        _, vel_crossings = positive_zero_crossings(vels[:, i, 2])
        contacts[name] = []
        contacts_tmp[name] = []
        arg_min_height = -1
        for j, grp in enumerate(groups):
            if len(grp) == 0:
                continue
            start_search = int(arg_min_height + 1)
            end_search = groups[j + 1][0] if j + 1 < len(groups) else -1
            seg = fh[start_search:end_search]
            if len(seg) == 0:
                continue
            arg_min_height = start_search + int(np.argmin(seg))
            possible = np.intersect1d(grp, vel_crossings)
            is_contact = [arg_min_height + k not in possible
                          for k in (-2, -1, 0, 1, 2)]
            if np.all(is_contact):
                arg_min_height = grp[-1]
                continue
            start_idx = int(arg_min_height - mid_way)
            end_idx = int(arg_min_height + mid_way)
            arg_min_height = grp[-1]
            if is_even:
                start_idx += 1
            if start_idx < 0:
                end_idx -= start_idx
                start_idx = 0
            if end_idx >= N:
                start_idx -= end_idx - N - 1
                end_idx = N - 1
            contacts[name].append([start_frame + start_idx,
                                   start_frame + end_idx, i, "TBD"])
            contacts_tmp[name].append([int(start_frame + grp[0]),
                                       int(start_frame + grp[-1]), i, "TBD"])
        if not contacts[name]:
            contacts[name] = None
            contacts_tmp[name] = None

    def assign(a: str, b: str):
        if contacts[a] is not None and contacts[b] is not None:
            if contacts[a][0][0] > contacts[b][0][0]:
                contacts[a][0][3], contacts[b][0][3] = "leading", "trailing"
            else:
                contacts[a][0][3], contacts[b][0][3] = "trailing", "leading"

    assign("HFL_foot", "HFR_foot")
    assign("HBL_foot", "HBR_foot")

    if data_dir is not None:
        grf_dir = os.path.join(data_dir, "grf")
        os.makedirs(grf_dir, exist_ok=True)
        for fname, c in (("autogen-contact.json", contacts),
                         ("autogen-contact-02.json", contacts_tmp)):
            with open(os.path.join(grf_dir, fname), "w",
                      encoding="utf-8") as f:
                json.dump({"start_frame": int(start_frame),
                           "end_frame": int(start_frame + N),
                           "contacts": c}, f)
    return contacts, contacts_tmp


def synth_grf_data(speed: float, direction: float, data_dir: str,
                   contact_fname: str = "autogen-contact.json",
                   out_fname: str = "data_synth") -> None:
    """Synthesize per-limb force profiles over the detected stances
    (reference ``synth_grf_data``, acinoset_misc.py:859-943): half-sine Fz
    with a speed/limb-role peak model, quadratic-spline Fx with deceleration
    then acceleration lobes."""
    from scipy import interpolate

    with open(os.path.join(data_dir, contact_fname), "r",
              encoding="utf-8") as f:
        cj = json.load(f)
    start_frame, end_frame = cj["start_frame"], cj["end_frame"]
    order = cj["contacts"]
    frames = {}
    for name in FOOT_NAMES:
        if (name not in order or order[name] is None
                or order[name][0][1] >= end_frame):
            continue
        start_idx = order[name][0][0] - 1
        end_idx = order[name][0][1] + 1
        start_idx = max(start_idx, start_frame)
        end_idx = min(end_idx, end_frame)
        stance_end = end_idx - start_idx
        if stance_end <= 0:
            continue
        peak_idx = stance_end // 2
        t = np.linspace(0, stance_end, stance_end)
        role = order[name][0][3]
        model = {("F", "leading"): MODEL_LFL, ("F", "trailing"): MODEL_NLFL,
                 ("B", "leading"): MODEL_LHL, ("B", "trailing"): MODEL_NLHL
                 }.get((name[1], role))
        if model is None:
            continue
        Fz_peak = model.predict(speed)
        Fx_dec = direction * 0.5 * Fz_peak
        Fx_acc = 0.5 * -Fx_dec
        synth_Fz = Fz_peak * np.sin(np.pi * (t / stance_end))
        ctrl = np.array([[0.0, 0.0], [peak_idx // 2, Fx_dec],
                         [peak_idx, 0.0],
                         [peak_idx + (stance_end - peak_idx) // 2, Fx_acc],
                         [stance_end, 0.0]])
        spline = interpolate.InterpolatedUnivariateSpline(
            ctrl[:, 0], ctrl[:, 1], k=2)
        synth_Fx = spline(t)
        n = end_frame - start_frame
        Fxyz = np.zeros((n, 3))
        sl = slice(start_idx - start_frame, end_idx - start_frame)
        Fxyz[sl, 0] = synth_Fx
        Fxyz[sl, 2] = synth_Fz
        frames[order[name][0][2] - 1] = Fxyz
    grf_io.save_force_plate_df(os.path.join(data_dir, f"{out_fname}.h5"),
                               frames)


def get_grf_profile(params_total_length: int, data_dir: str,
                    metadata_dir: str, direction: float,
                    scale_forces_by: float, kinetic_dataset: bool = False,
                    synthetic_data: bool = True
                    ) -> Tuple[Dict, Dict]:
    """Per-frame (GRFz, GRFxy-polygon) profiles for each foot in body-weight
    units (reference ``get_grf_profile``, acinoset_misc.py:946-1027). The
    measured-force-plate branch resamples 3500 Hz -> 200 Hz (polyphase 2/35)
    and removes the DC offset of the first 500 samples."""
    from scipy import signal

    from ..dynamics.eom import POLYGON_D

    grf = grf_io.load_force_plate_df(os.path.join(
        data_dir, "grf", "data_synth.h5" if synthetic_data else "data.h5"))
    meta_path = (os.path.join(data_dir, "grf", "autogen-contact.json")
                 if synthetic_data
                 else os.path.join(metadata_dir, "metadata.json"))
    with open(meta_path, "r", encoding="utf-8") as f:
        cj = json.load(f)
    start_frame = cj["start_frame"]
    order = cj["contacts"]
    nfe = params_total_length
    gz = {n: [0.0] * nfe for n in FOOT_NAMES}
    gxy = {n: [[0.0] * 4 for _ in range(nfe)] for n in FOOT_NAMES}
    for name in FOOT_NAMES:
        if name not in order or order[name] is None:
            continue
        plate = order[name][0][2] - 1
        if plate not in grf:
            continue
        F = grf[plate]  # (n, 3) Fx Fy Fz
        if synthetic_data or not kinetic_dataset:
            Fx, Fy, Fz = F[:, 0], F[:, 1], F[:, 2]
        else:
            def prep(col, sgn=1.0):
                x = col - col[:500].mean()
                return sgn * signal.resample_poly(x, up=2, down=35) \
                    * scale_forces_by
            Fz = prep(F[:, 2])
            Fx = prep(F[:, 0], direction)
            Fy = prep(F[:, 1], direction)
        on_ground = set(range(order[name][0][0], order[name][0][1] + 1))
        for fe in range(1, nfe):
            if (start_frame + fe - 1) not in on_ground:
                continue
            k = fe - 1 if (synthetic_data or not kinetic_dataset) \
                else start_frame + fe - 1
            if k >= len(Fz):
                continue
            z, x, y = Fz[k], Fx[k], Fy[k]
            gz[name][fe - 1] = float(z)
            comps = POLYGON_D @ np.array([x, y, 0.0])
            mi = int(np.argmax(comps))
            if comps[mi] > 0:
                gxy[name][fe - 1][mi] = float(comps[mi])
    return gz, gxy
