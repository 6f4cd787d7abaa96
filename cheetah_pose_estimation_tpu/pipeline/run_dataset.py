"""Dataset driver: the reference ``run_dataset.py`` CLI rebuilt TPU-native.

Same test-set table, directory conventions, output metrics
(``dataset_results.csv``) and flags; the per-trial IPOPT invocations become
jitted GN solves, and a batched mode pads/stacks all trials and runs them as
one vmapped solve (sharded over a device mesh when several chips are
available).

Because the reference distributes only solver *outputs*, this module can also
materialize a synthetic copy of the 10-trial AcinoSet test set (ground-truth
trajectories from the shipped fte.pickle files, synthetic calibrated cameras
and DLC-like detections) so the full pipeline runs end-to-end anywhere.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

# honor JAX_PLATFORMS for the CLI: the tunneled TPU plugin force-selects its
# platform and ignores the env var, so pin it in-process before backend init
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from ..data import io as dio
from ..data import synthetic as syn
from ..models import params as params_mod
from ..models import skeleton as sk
from ..ops import camera as cam_ops
from ..utils.device import host_cpu
from . import estimator as est_mod
from . import metrics as metrics_mod

# the reference's 10-trial monocular AcinoSet test set
# (run_dataset.py:1385-1396)
TEST_SET: Tuple[Tuple[str, str, str], ...] = (
    ("jules", "2017_12_09/bottom", "flick2"),
    ("jules", "2019_03_09", "flick1"),
    ("phantom", "2019_03_03", "run"),
    ("phantom", "2017_09_02/top", "run1_2"),
    ("jules", "2017_08_29/top", "run1_2"),
    ("phantom", "2017_08_29/top", "run1_1"),
    ("jules", "2017_08_29/top", "run1_1"),
    ("jules", "2017_09_02/top", "run1"),
    ("phantom", "2019_03_07", "run"),
    ("jules", "2017_09_02/bottom", "run2"),
)

CAM_OVERRIDES = [0, 0, 0, 3, 3, 3, 5, 0, 3, 0]  # run_dataset.py:1398

# the 5 force-plate trials (reference run_dataset.py:1093-1099)
KINETIC_SET: Tuple[Tuple[str, str, str], ...] = (
    ("arabia", "2009_09_07", "06"),
    ("shiraz", "2009_09_07", "04"),
    ("shiraz", "2009_09_08", "04"),
    ("shiraz", "2009_09_11", "01"),
    ("shiraz", "2009_09_11", "02"),
)

REF_TEST_SET = "/root/reference/data/test_set"


def _reference_gt_trajectory(date: str, cheetah: str, trial_name: str,
                             fallback_frames: int, fallback_seed: int,
                             fallback_fps: float = 120.0) -> np.ndarray:
    """Ground-truth q for a synthetic trial: prefer the shipped
    *physics-based* solution (``fte_kinetic_<cam>`` — dynamically consistent
    by construction, so the physics stage is informative about GT, and
    on-manifold for the learned priors), then the multi-view kinematic one,
    then the procedural gallop."""
    from glob import glob as _glob
    trial_dir = os.path.join(REF_TEST_SET, date, cheetah, trial_name)
    cands = sorted(_glob(os.path.join(trial_dir, "fte_kinetic_*",
                                      "fte.pickle")))
    cands.append(os.path.join(trial_dir, "fte_kinematic", "fte.pickle"))
    for p in cands:
        if os.path.exists(p):
            with open(p, "rb") as f:
                return pickle.load(f)["q"]
    return syn.gallop_trajectory(fallback_frames, fps=fallback_fps,
                                 seed=fallback_seed)


def materialize_synthetic_testset(root_dir: str, n_cams: int = 6,
                                  seed: int = 0,
                                  noise_px: float = 1.5,
                                  occlusion_rate: float = 2.0,
                                  confusion_rate: float = 1.2) -> List[str]:
    """Create an AcinoSet-style directory tree for every test trial, rendered
    from the reference's shipped ground-truth trajectories with the
    correlated DLC failure model (synthetic.corrupt_dlc) — the regime the
    reference's monocular modes were designed for."""
    from ..utils.device import host_cpu
    made = []
    for i, (cheetah, date, trial_name) in enumerate(TEST_SET):
      # rendering is pure host prep: on the tunneled accelerator backend
      # every distinct-shape scrap op here costs a compile round-trip
      with host_cpu():
        data_path = os.path.join(date, cheetah, trial_name)
        q_gt = _reference_gt_trajectory(date, cheetah, trial_name,
                                        40 + 2 * i, i)
        subject = params_mod.get_subject(cheetah)
        fps = 120.0 if "2019" in date else 90.0
        markers = np.asarray(sk.fk_markers(q_gt, subject))
        scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=n_cams,
                                 fps=fps, seed=seed + i)
        tr = syn.synthesize(q_gt, subject, scene, noise_px=noise_px,
                            outlier_frac=0.02, seed=seed + i,
                            subject_name=cheetah,
                            occlusion_rate=occlusion_rate,
                            confusion_rate=confusion_rate)
        from . import contacts as contacts_mod
        syn.write_trial_dir(tr, root_dir, data_path, monocular_cam=2,
                            ground_plane_height=contacts_mod.
                            estimate_ground_height(q_gt, subject))
        # stash ground truth for scoring against the true synthetic GT
        with open(os.path.join(root_dir, data_path, "synthetic_gt.pickle"),
                  "wb") as f:
            pickle.dump({"q": q_gt, "positions": tr.markers_gt}, f)
        made.append(data_path)
    return made


def materialize_synthetic_kinetic_testset(root_dir: str, n_cams: int = 4,
                                          seed: int = 100) -> List[str]:
    """Synthetic copies of the 5 force-plate trials: pinhole cameras at
    200 fps (the 2009 kinetic-dataset rig)."""
    from ..utils.device import host_cpu
    made = []
    for i, (cheetah, date, trial) in enumerate(KINETIC_SET):
      with host_cpu():  # host prep (see materialize_synthetic_testset)
        data_path = os.path.join("kinetic_dataset", date, cheetah,
                                 f"trial{trial}")
        q_gt = _reference_gt_trajectory(
            os.path.join("kinetic_dataset", date), cheetah, f"trial{trial}",
            50, seed + i, fallback_fps=200.0)
        subject = params_mod.get_subject(cheetah)
        markers = np.asarray(sk.fk_markers(q_gt, subject))
        scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=n_cams,
                                 fps=200.0, distance=6.0, fisheye=False,
                                 seed=seed + i)
        tr = syn.synthesize(q_gt, subject, scene, noise_px=2.0,
                            outlier_frac=0.01, seed=seed + i,
                            subject_name=cheetah)
        from . import contacts as contacts_mod
        syn.write_trial_dir(tr, root_dir, data_path, monocular_cam=0,
                            ground_plane_height=contacts_mod.
                            estimate_ground_height(q_gt, subject))
        with open(os.path.join(root_dir, data_path, "synthetic_gt.pickle"),
                  "wb") as f:
            pickle.dump({"q": q_gt, "positions": tr.markers_gt}, f)
        made.append(data_path)
    return made


def run_monocular(root_dir: str, dir_prefix: str,
                  test_set: Tuple = TEST_SET,
                  cam_overrides: Optional[List[int]] = None,
                  modes: Tuple[str, ...] = ("ground-truth", "default",
                                            "data-driven", "physics-based"),
                  data_driven_dataset: Optional[str] = None,
                  verbose: bool = True):
    """Per-trial staged reconstruction (reference run_dataset.py:1143-1231)."""
    t_start = time.time()
    for idx, (cheetah, date, trial_name) in enumerate(test_set):
        data_path = os.path.join(date, cheetah, trial_name)
        if not os.path.isdir(os.path.join(root_dir, data_path)):
            print(f"skip missing {data_path}")
            continue
        cam = cam_overrides[idx] if cam_overrides is not None else None
        if verbose:
            print(f"== {data_path} (cam={cam}) ==")
        if "ground-truth" in modes:
            est = est_mod.init_trajectory(root_dir, data_path, cheetah,
                                          kinematic_model=True)
            est_mod.estimate_kinematics(est, out_dir_prefix=dir_prefix,
                                        solver_output=verbose)
        if "default" in modes:
            est = est_mod.init_trajectory(root_dir, data_path, cheetah,
                                          monocular_enable=True,
                                          override_monocular_cam=cam,
                                          kinematic_model=True)
            est_mod.estimate_kinematics(est, out_dir_prefix=dir_prefix,
                                        solver_output=verbose)
        if "data-driven" in modes:
            est = est_mod.init_trajectory(root_dir, data_path, cheetah,
                                          monocular_enable=True,
                                          override_monocular_cam=cam,
                                          kinematic_model=True)
            est_mod.estimate_kinematics(
                est, monocular_constraints=True, out_dir_prefix=dir_prefix,
                data_driven_dataset=data_driven_dataset,
                solver_output=verbose)
        if "physics-based" in modes:
            # bounded retry on solver failure (the reference loops on
            # ValueError until IPOPT happens to succeed,
            # run_dataset.py:1199-1228). The LM solve is deterministic, so a
            # bare re-run would fail identically — each fallback attempt
            # changes the problem: joint GRF estimation first, then
            # synthesized GRF profiles, then additionally without the pose
            # prior.
            attempts = (dict(joint_estimation=True),
                        dict(joint_estimation=False, synthesised_grf=True),
                        dict(joint_estimation=False, synthesised_grf=True,
                             disable_pose_prior=True))
            for attempt, kw in enumerate(attempts):
                est = est_mod.init_trajectory(root_dir, data_path, cheetah,
                                              monocular_enable=True,
                                              override_monocular_cam=cam,
                                              kinematic_model=False)
                est_mod.determine_contacts(est, monocular=True,
                                           out_dir_prefix=dir_prefix)
                try:
                    ok = est_mod.estimate_kinetics(
                        est, out_dir_prefix=dir_prefix,
                        solver_output=verbose, **kw)
                except (ValueError, FileNotFoundError) as e:
                    print(f"physics-based attempt {attempt + 1} failed: {e}")
                    continue
                if ok:
                    break
                print(f"physics-based attempt {attempt + 1} "
                      f"({kw}) not acceptable, trying fallback")
            else:
                print(f"physics-based FAILED for {data_path} "
                      "(no acceptable solution in any configuration)")
    print(f"Run through all videos took {time.time() - t_start:.2f}s")


def run_kinetic(root_dir: str, dir_prefix: str,
                kinetic_set: Tuple = KINETIC_SET, verbose: bool = True):
    """Force-plate-trial pipeline (reference run_dataset.py:1092-1140):
    kinematics -> kinetics with synthesized GRF + ground constraint -> GRF
    re-estimation with tight EOM bounds."""
    t0 = time.time()
    for cheetah, date, trial in kinetic_set:
        data_path = os.path.join("kinetic_dataset", date, cheetah,
                                 f"trial{trial}")
        if not os.path.isdir(os.path.join(root_dir, data_path)):
            print(f"skip missing {data_path}")
            continue
        est = est_mod.init_trajectory(root_dir, data_path, cheetah,
                                      kinetic_dataset=True,
                                      kinematic_model=True)
        ok = est_mod.estimate_kinematics(est, out_dir_prefix=dir_prefix,
                                         solver_output=verbose)
        if not ok:
            continue
        est = est_mod.init_trajectory(root_dir, data_path, cheetah,
                                      kinetic_dataset=True,
                                      kinematic_model=False)
        est_mod.determine_contacts(est, out_dir_prefix=dir_prefix)
        ok = est_mod.estimate_kinetics(est, joint_estimation=False,
                                       synthesised_grf=True,
                                       ground_constraint=True,
                                       out_dir_prefix=dir_prefix,
                                       solver_output=verbose)
        if not ok:
            continue
        est = est_mod.init_trajectory(root_dir, data_path, cheetah,
                                      kinetic_dataset=True,
                                      kinematic_model=False)
        est_mod.estimate_grf(est, out_dir_prefix=dir_prefix,
                             solver_output=verbose)
    print(f"Run through all videos took {time.time() - t0:.2f}s")


def kinetic_analysis(root_dir: str, dir_prefix: str,
                     kinetic_set: Tuple = KINETIC_SET) -> Dict:
    """Biomechanics analysis over the kinetic trials (reference
    run_dataset.py:1018-1089): stance-normalized gait curves, 2D
    reprojection metrics vs hand labels, torque plots, GRF error."""
    from . import results as results_mod
    from ..dynamics.eom import TORQUE_MAP

    out = {}
    gait_array = []
    for cheetah, date, trial in kinetic_set:
        data_path = os.path.join("kinetic_dataset", date, cheetah,
                                 f"trial{trial}")
        base = os.path.join(dir_prefix, data_path)
        fte_p = os.path.join(base, "fte_kinetic", "fte.pickle")
        if not os.path.exists(fte_p):
            continue
        d = dio.load_fte_pickle(fte_p)
        cj_path = os.path.join(base, "grf", "autogen-contact.json")
        meta_path = os.path.join(root_dir, data_path, "metadata.json")
        contact_path = cj_path if os.path.exists(cj_path) else meta_path
        tau = np.zeros((d["q"].shape[0], len(TORQUE_MAP.names)))
        col = 0
        for name in TORQUE_MAP.names:
            motor = name.rsplit(":", 1)[0]
            if motor in d["tau"]:
                idx = [n for n in TORQUE_MAP.names
                       if n.startswith(motor + ":")].index(name)
                tau[:, col] = d["tau"][motor][:, idx]
            col += 1
        ga = results_mod.gait_analysis(d["q"], tau, contact_path, fps=200.0)
        gait_array.append(ga)
        results_mod.plot_torques(tau, 200.0,
                                 os.path.join(base, "torques.pdf"))
        hand_dir = os.path.join(root_dir, data_path, "dlc_hand_labeled")
        if os.path.isdir(hand_dir):
            out[data_path] = results_mod.reprojection_errors(
                os.path.join(base, "fte_kinetic"), hand_dir)
        if gait_array:
            results_mod.plot_gait_attributes(
                ga, os.path.join(base, "gait.pdf"))
    return out


def distance_from_camera(data_path: str, com_pos: np.ndarray, cam_idx: int):
    """CoM distance and view angle from the monocular camera (reference
    run_dataset.py:126-140)."""
    import jax

    k_arr, d_arr, r_arr, t_arr, cam_res, _, _ = dio.find_scene_file(data_path)
    d_arr = d_arr.reshape(-1, 4)
    with host_cpu():
        center_img = np.array([cam_res[0] / 2.0, cam_res[1] / 2.0])
        img_pts = np.asarray(cam_ops.project_fisheye(
            com_pos, k_arr[cam_idx], d_arr[cam_idx], r_arr[cam_idx],
            t_arr[cam_idx]))
        r1 = np.asarray(cam_ops.undistort_fisheye(
            center_img[None], k_arr[cam_idx], d_arr[cam_idx]))
        r2 = np.asarray(cam_ops.undistort_fisheye(
            img_pts, k_arr[cam_idx], d_arr[cam_idx]))
    r1 = np.concatenate([r1, [[1.0]]], axis=1)[0]
    r2 = np.concatenate([r2, np.ones((len(r2), 1))], axis=1)
    cosang = r2 @ r1 / (np.linalg.norm(r2, axis=1) * np.linalg.norm(r1))
    angles = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
    t = t_arr[cam_idx].reshape(3)
    cam_pos = -np.linalg.inv(r_arr[cam_idx]) @ t
    dist = np.linalg.norm(com_pos - cam_pos[None], axis=1)
    return dist, angles


# Hand-curated AcinoSet frame ranges (reference run_dataset.py:1245-1300,
# active entries only): dirs outside this table had bad input data and the
# reference skipped them — the curation IS the dataset definition.
ACINOSET_SELECTED_FRAMES: Dict[str, Tuple[int, int]] = {
    "2019_03_03/phantom/run": (100, 220),
    "2019_03_09/lily/run": (80, 170),
    "2017_08_29/top/phantom/run1_1": (20, 160),
    "2017_12_21/top/lily/run1": (10, 105),
    "2017_12_21/bottom/jules/flick2_2": (5, 150),
    "2017_12_10/top/zorro/flick1": (115, 210),
    "2017_12_10/bottom/zorro/flick2": (5, 140),
    "2017_09_03/bottom/zorro/run2_1": (130, 270),
    "2017_12_09/bottom/phantom/run2": (20, 115),
    "2017_09_03/bottom/zorro/run2_3": (5, 150),
    "2017_08_29/top/jules/run1_1": (10, 110),
    "2017_09_02/top/jules/run1": (10, 110),
    "2019_03_07/menya/run": (60, 160),
    "2017_09_02/top/phantom/run1_2": (20, 160),
    "2019_03_07/phantom/run": (100, 200),
    "2019_02_27/romeo/run": (40, 150),
    "2019_02_27/romeo/flick": (10, 150),
    "2017_08_29/top/jules/run1_2": (30, 130),
    "2017_12_16/top/cetane/run1": (110, 210),
    "2019_02_27/kiara/run": (20, 100),
    "2017_09_02/bottom/jules/run2": (50, 160),
    "2017_09_03/bottom/zorro/run2_2": (32, 141),
    "2019_03_09/jules/flick1": (40, 160),
    "2017_09_03/bottom/zorro/flick2": (10, 100),
    "2017_08_29/bottom/zorro/flick2": (75, 135),
    "2017_12_09/bottom/jules/flick2": (5, 75),
    "2017_12_17/bottom/zorro/flick2": (5, 145),
}

# erroneous-input skip list (reference bad_videos, run_dataset.py:1302)
ACINOSET_BAD_VIDEOS: Tuple[str, ...] = ()


def run_acinoset(root_dir: str, dir_prefix: str,
                 modes: Tuple[str, ...] = ("ground-truth", "default",
                                           "data-driven"),
                 enable_ppm_for_flicks: bool = True,
                 use_curated_table: bool = True,
                 verbose: bool = False) -> List[str]:
    """Batch over AcinoSet trial directories under root_dir (reference
    run_acinoset, run_dataset.py:1234-1331).

    With ``use_curated_table`` (default), only dirs in
    ``ACINOSET_SELECTED_FRAMES`` run, with the hand-curated frame ranges and
    the ``ACINOSET_BAD_VIDEOS`` skip list — the reference's curation
    semantics for real data. Dirs not in the table (e.g. synthetic trials)
    still run when the flag is off, windowed by their metadata.json. PPMs
    are enabled for 'flick' trials as the reference does
    (run_dataset.py:1323)."""
    import glob as _glob
    done = []
    for meta in sorted(_glob.glob(os.path.join(root_dir, "**",
                                               "metadata.json"),
                                  recursive=True)):
        trial_dir = os.path.dirname(meta)
        if not os.path.isdir(os.path.join(trial_dir, "dlc")):
            continue
        data_path = os.path.relpath(trial_dir, root_dir)
        if data_path in ACINOSET_BAD_VIDEOS:
            continue
        frames = ACINOSET_SELECTED_FRAMES.get(data_path)
        if use_curated_table and frames is None and any(
                data_path.startswith(y) for y in
                ("2017_", "2019_", "2016_")):
            # a real AcinoSet dir outside the curated table was excluded for
            # bad input data (commented-out entries in the reference's
            # table) — skip it; non-AcinoSet-named dirs (synthetic trials)
            # run windowed by their own metadata.json
            continue
        start, end = (frames if frames is not None else (-1, -1))
        if frames is not None:
            # a synthetic materialization of a curated trial is shorter than
            # the real video; only apply the manual window when the trial's
            # own frame range covers it, else defer to metadata.json
            with open(meta, encoding="utf-8") as f:
                md = json.load(f)
            if not (md["start_frame"] <= start and end <= md["end_frame"]):
                start, end = -1, -1
        cheetah = next((n for n in ("jules", "phantom", "shiraz", "arabia")
                        if n in data_path), "acinoset")
        is_flick = "flick" in data_path
        use_ppm = (enable_ppm_for_flicks and is_flick and os.path.isdir(
            os.path.join(trial_dir, "dlc_pw")))
        try:
            for mode in modes:
                est = est_mod.init_trajectory(
                    root_dir, data_path, cheetah, kinematic_model=True,
                    start_frame=start, end_frame=end,
                    monocular_enable=mode != "ground-truth",
                    enable_ppm=use_ppm)
                est_mod.estimate_kinematics(
                    est, monocular_constraints=mode == "data-driven",
                    out_dir_prefix=dir_prefix, solver_output=verbose)
            done.append(data_path)
        except (FileNotFoundError, AssertionError) as e:
            print(f"skip {data_path}: {e}")
    return done


def run_monocular_all(root_dir: str, dir_prefix: str,
                      test_set: Tuple = TEST_SET,
                      modes: Tuple[str, ...] = ("default", "data-driven"),
                      batched: bool = False,
                      verbose: bool = False):
    """Sweep every camera of every trial (reference run_monocular_all,
    run_dataset.py:918-1015) — feeds the distance-vs-error analysis.

    With ``batched`` the (trial, camera) combinations become one more batch
    axis: all combos are padded/stacked and solved as one vmapped run per
    (mode, subject) group instead of a serial double loop."""
    combos: List[Tuple[str, str, str]] = []
    cams: List[int] = []
    for cheetah, date, trial_name in test_set:
        data_path = os.path.join(date, cheetah, trial_name)
        if not os.path.isdir(os.path.join(root_dir, data_path)):
            continue
        k_arr, *_ = dio.find_scene_file(os.path.join(root_dir, data_path))
        for cam in range(len(k_arr)):
            combos.append((cheetah, date, trial_name))
            cams.append(cam)
    if batched:
        from . import batched as batched_mod
        # the multi-view ground-truth solve once per unique trial (the
        # per-camera modes are scored against it)
        unique = list(dict.fromkeys(combos))
        batched_mod.run_monocular_batched(
            root_dir, dir_prefix, unique, modes=("ground-truth",),
            verbose=verbose)
        batched_mod.run_monocular_batched(
            root_dir, dir_prefix, combos, cam_overrides=cams,
            modes=tuple(m for m in modes if m != "ground-truth"),
            verbose=verbose)
        return
    for combo, cam in zip(combos, cams):
        run_monocular(root_dir, dir_prefix, (combo,), cam_overrides=[cam],
                      modes=tuple(m for m in modes), verbose=verbose)


def is_outlier(points: np.ndarray, thresh: float = 3.5) -> np.ndarray:
    """Modified z-score outlier mask (reference ``is_outlier``,
    run_dataset.py:20-51): |0.6745 (x - median)| / MAD > thresh."""
    points = np.asarray(points, float)
    if points.ndim == 1:
        points = points[:, None]
    med = np.median(points, axis=0)
    diff = np.sqrt(np.sum((points - med) ** 2, axis=-1))
    mad = np.median(diff)
    if mad == 0:
        return np.zeros(len(points), bool)
    return 0.6745 * diff / mad > thresh


def distance_vs_error(root_dir: str, dir_prefix: str,
                      test_set: Tuple = TEST_SET,
                      cam_overrides: Optional[List[int]] = None,
                      save_plot: bool = True) -> pd.DataFrame:
    """Reconstruction error vs CoM camera distance scatter (reference
    run_dataset.py:208-362)."""
    rows = []
    for idx, (cheetah, date, trial_name) in enumerate(test_set):
        data_path = os.path.join(date, cheetah, trial_name)
        base = os.path.join(dir_prefix, data_path)
        gt_p = os.path.join(base, "fte_kinematic", "fte.pickle")
        if not os.path.exists(gt_p):
            continue
        gt = dio.load_fte_pickle(gt_p)
        if cam_overrides is not None:
            cams = [cam_overrides[idx]]
        else:
            # scan the whole camera space where per-camera artifacts exist
            # (reference distance_vs_error sweeps its cam_space tables,
            # run_dataset.py:218-229); fall back to the metadata camera
            k_arr, *_ = dio.find_scene_file(os.path.join(root_dir,
                                                         data_path))
            cams = [c for c in range(len(k_arr)) if os.path.isdir(
                os.path.join(base, f"fte_kinematic_orig_{c}"))]
            if not cams:
                with open(os.path.join(root_dir, data_path,
                                       "metadata.json"),
                          encoding="utf-8") as f:
                    cams = [json.load(f)["monocular_cam"]]
        for cam_idx in cams:
            for mode, sub in (("default", f"fte_kinematic_orig_{cam_idx}"),
                              ("data-driven", f"fte_kinematic_{cam_idx}"),
                              ("physics-based", f"fte_kinetic_{cam_idx}")):
                p = os.path.join(base, sub, "fte.pickle")
                if not os.path.exists(p):
                    continue
                d = dio.load_fte_pickle(p)
                n = min(len(d["positions"]), len(gt["positions"]))
                err = np.linalg.norm(
                    d["positions"][:n] - gt["positions"][:n],
                    axis=2).mean() * 1000
                dist, angle = distance_from_camera(
                    os.path.join(root_dir, data_path),
                    np.asarray(gt["com_pos"]), cam_idx)
                rows.append(dict(trial=data_path, cam=cam_idx, mode=mode,
                                 mpe_mm=float(err),
                                 distance_m=float(dist.mean()),
                                 angle_deg=float(np.mean(angle))))
    df = pd.DataFrame(rows)
    if save_plot and len(df):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(12, 8), dpi=60)
        for mode, grp in df.groupby("mode"):
            # drop extreme failures from the scatter (reference filters with
            # a modified z-score, run_dataset.py:297-313)
            keep = ~is_outlier(grp["mpe_mm"].to_numpy(), 5.0)
            grp = grp[keep]
            plt.scatter(grp["distance_m"], grp["mpe_mm"], label=mode)
        plt.xlabel("CoM distance from camera (m)")
        plt.ylabel("MPE (mm)")
        plt.legend()
        os.makedirs(dir_prefix, exist_ok=True)
        fig.savefig(os.path.join(dir_prefix, "dist_vs_error.pdf"),
                    bbox_inches="tight")
        plt.close(fig)
        df.to_csv(os.path.join(dir_prefix, "dist_vs_error.csv"), index=False)
    return df


def validate_dataset(dir_prefix: str, test_set: Tuple = TEST_SET,
                     cam_overrides: Optional[List[int]] = None) -> Dict:
    """Plausibility filters (reference run_dataset.py:54-115): CoM speed
    <= 50 m/s and base height in (-0.3, 1) m for every saved solution."""
    report = {}
    for idx, (cheetah, date, trial_name) in enumerate(test_set):
        data_path = os.path.join(date, cheetah, trial_name)
        base = os.path.join(dir_prefix, data_path)
        cam = cam_overrides[idx] if cam_overrides is not None else None
        for sub in os.listdir(base) if os.path.isdir(base) else []:
            if not sub.startswith("fte"):
                continue
            p = os.path.join(base, sub, "fte.pickle")
            if not os.path.exists(p):
                continue
            d = dio.load_fte_pickle(p)
            speed = np.linalg.norm(d["com_vel"], axis=1)
            ok = bool((speed <= 50.0).all()
                      and (d["q"][:, 2] > -0.3).all()
                      and (d["q"][:, 2] < 1.0).all())
            report[f"{data_path}/{sub}"] = ok
    return report


def dataset_post_process(root_dir: str, dir_prefix: str,
                         test_set: Tuple = TEST_SET,
                         cam_overrides: Optional[List[int]] = None,
                         save_plots: bool = True) -> pd.DataFrame:
    """Aggregate MPE/MPJPE/CoM-vel RMSE/smoothness/time per mode ->
    ``dataset_results.csv`` (reference run_dataset.py:365-632)."""
    results: Dict[str, Dict] = {}
    for idx, (cheetah, date, trial_name) in enumerate(test_set):
        data_path = os.path.join(date, cheetah, trial_name)
        base = os.path.join(dir_prefix, data_path)
        meta_path = os.path.join(root_dir, data_path, "metadata.json")
        if not os.path.exists(os.path.join(base, "fte_kinematic",
                                           "fte.pickle")):
            continue
        if cam_overrides is not None:
            cam_idx = cam_overrides[idx]
        else:
            with open(meta_path, encoding="utf-8") as f:
                cam_idx = json.load(f)["monocular_cam"]
        gt = dio.load_fte_pickle(os.path.join(base, "fte_kinematic",
                                              "fte.pickle"))
        com_vel_gt = np.asarray(gt["com_vel"])
        entry: Dict[str, Dict] = {}
        for mode, sub in (("default", f"fte_kinematic_orig_{cam_idx}"),
                          ("data-driven", f"fte_kinematic_{cam_idx}"),
                          ("physics-based", f"fte_kinetic_{cam_idx}")):
            p = os.path.join(base, sub, "fte.pickle")
            if not os.path.exists(p):
                continue
            d = dio.load_fte_pickle(p)
            n = min(len(d["positions"]), len(gt["positions"]))
            mpjpe_tbl, _, _ = metrics_mod.traj_error(
                gt["positions"][:n].copy(), d["positions"][:n].copy(),
                mode, centered=True, verbose=False)
            mpe_tbl, _, smooth = metrics_mod.traj_error(
                gt["positions"][:n].copy(), d["positions"][:n].copy(),
                mode, verbose=False)
            sim = metrics_mod.rmse(com_vel_gt[:n - 1],
                                   np.asarray(d["com_vel"])[:n - 1])
            entry[mode] = {
                "mpe": round(float(mpe_tbl.mean().iloc[0]), 1),
                "mpjpe": round(float(mpjpe_tbl.mean().iloc[0]), 1),
                "CoM vel rmse": round(sim, 2),
                "smoothness error": round(smooth, 1),
                "time": round(float(d["processing_time_s"] or 0.0), 1),
            }
        if entry:
            results[data_path] = entry
    dict_of_df = {k: pd.DataFrame(v) for k, v in results.items()}
    if not dict_of_df:
        return pd.DataFrame()
    results_df = pd.concat(dict_of_df, axis=1)
    os.makedirs(dir_prefix, exist_ok=True)
    results_df.to_csv(os.path.join(dir_prefix, "dataset_results.csv"))
    print(results_df.T)
    if save_plots:
        _post_process_plots(results_df, dir_prefix)
    return results_df


def _post_process_plots(results_df: pd.DataFrame, dir_prefix: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    try:
        means = results_df.T.groupby(level=1).mean(numeric_only=True)
        ax = means[["mpe", "mpjpe"]].plot(kind="barh")
        fig = ax.get_figure()
        plt.xlabel("Error (mm)")
        fig.savefig(os.path.join(dir_prefix, "data_driven_mpjpe_result.pdf"),
                    bbox_inches="tight")
        plt.close("all")
    except Exception as e:  # plotting must never fail the pipeline
        print(f"plotting skipped: {e}")


def _maybe_ablation_figure(dir_prefix: str):
    """Render the combined ablation figure once both family CSVs exist."""
    both = all(os.path.exists(os.path.join(dir_prefix, f))
               for f in ("data_driven_ablation_results.csv",
                         "physics_based_ablation_results.csv"))
    if both:
        from . import results as results_mod
        results_mod.ablation_study(dir_prefix)


def main(argv=None):
    from ..utils.device import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(
        description="TPU-native cheetah reconstruction dataset driver")
    parser.add_argument("--root_dir", type=str, default="./cheetah_videos")
    parser.add_argument("--out_dir_prefix", type=str, default="./out")
    parser.add_argument("--run_monocular", action="store_true")
    parser.add_argument("--run_acinoset", action="store_true")
    parser.add_argument("--run_kinetic", action="store_true")
    parser.add_argument("--run_analysis", action="store_true")
    parser.add_argument("--run_grid_search", action="store_true")
    parser.add_argument("--run_degradation_sweep", action="store_true")
    parser.add_argument("--sweep_physics", action="store_true",
                        help="add a physics-based column to the degradation "
                             "sweep (kinetic FTE warm-started from each "
                             "rate's data-driven solution)")
    parser.add_argument("--run_data_driven_ablation_study",
                        action="store_true")
    parser.add_argument("--run_physics_based_ablation_study",
                        action="store_true")
    parser.add_argument("--override_default_cam", action="store_true")
    parser.add_argument("--clean", action="store_true",
                        help="regenerate reconstructions before analysis")
    parser.add_argument("--materialize_synthetic", action="store_true",
                        help="render the synthetic test set into root_dir "
                             "from the reference's shipped trajectories")
    parser.add_argument("--batched", action="store_true",
                        help="solve each mode's whole trial set as one "
                             "vmapped accelerator batch (float32) instead "
                             "of the serial per-trial loop")
    parser.add_argument("--trials", type=int, default=None,
                        help="limit to the first N test-set trials")
    parser.add_argument("--no_ground_anchor", action="store_true",
                        help="disable the monocular ground-plane depth "
                             "anchor (analytic ray shift + anchored "
                             "polish, pipeline/depth_anchor.py)")
    args = parser.parse_args(argv)

    test_set = TEST_SET[: args.trials] if args.trials else TEST_SET
    cam_overrides = CAM_OVERRIDES if args.override_default_cam else None
    if cam_overrides is not None and args.trials:
        cam_overrides = cam_overrides[: args.trials]
    if args.materialize_synthetic:
        made = materialize_synthetic_testset(args.root_dir)
        print(f"materialized {len(made)} synthetic trials in {args.root_dir}")
    if args.run_monocular:
        if args.clean:
            if args.batched:
                from . import batched
                batched.run_monocular_batched(
                    args.root_dir, args.out_dir_prefix, test_set,
                    cam_overrides,
                    modes=("ground-truth", "default", "data-driven",
                           "physics-based"),
                    ground_anchor=not args.no_ground_anchor)
            else:
                run_monocular(args.root_dir, args.out_dir_prefix, test_set,
                              cam_overrides)
        dataset_post_process(args.root_dir, args.out_dir_prefix, test_set,
                             cam_overrides)
    if args.run_kinetic:
        if args.clean:
            run_kinetic(args.root_dir, args.out_dir_prefix)
        print(kinetic_analysis(args.root_dir, args.out_dir_prefix))
    if args.run_acinoset:
        if args.clean:
            done = run_acinoset(args.root_dir, args.out_dir_prefix)
            print(f"processed {len(done)} AcinoSet trials")
        print(validate_dataset(args.out_dir_prefix))
    if args.run_analysis:
        if args.clean:
            run_monocular_all(args.root_dir, args.out_dir_prefix, test_set,
                              batched=args.batched)
        print(distance_vs_error(args.root_dir, args.out_dir_prefix,
                                test_set, cam_overrides))
        from . import results as results_mod
        results_mod.example_robustness(args.root_dir, args.out_dir_prefix)
    if args.run_grid_search:
        from . import results as results_mod
        from . import studies
        if args.batched:
            studies.run_grid_search_batched(
                args.root_dir, args.out_dir_prefix, test_set,
                cam_overrides=cam_overrides)
        else:
            studies.run_grid_search(args.root_dir, args.out_dir_prefix,
                                    test_set)
        studies.model_selection_analysis(out_dir=args.out_dir_prefix)
        results_mod.data_driven_analysis(args.out_dir_prefix)
    if args.run_degradation_sweep:
        from . import studies
        studies.run_degradation_sweep(out_dir=args.out_dir_prefix,
                                      include_physics=args.sweep_physics)
    if args.run_data_driven_ablation_study:
        from . import studies
        if args.batched:
            studies.run_data_driven_ablation_batched(
                args.root_dir, args.out_dir_prefix, test_set, cam_overrides)
        else:
            studies.run_data_driven_ablation_study(
                args.root_dir, args.out_dir_prefix, test_set)
        _maybe_ablation_figure(args.out_dir_prefix)
    if args.run_physics_based_ablation_study:
        from . import studies
        if args.batched:
            studies.run_physics_ablation_batched(
                args.root_dir, args.out_dir_prefix, test_set, cam_overrides)
        else:
            studies.run_physics_based_ablation_study(
                args.root_dir, args.out_dir_prefix, test_set, cam_overrides)
        _maybe_ablation_figure(args.out_dir_prefix)


if __name__ == "__main__":
    main()
