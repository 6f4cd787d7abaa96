"""Single-trial workflow — the counterpart of the reference's tests.ipynb
(init -> kinematics -> contacts -> kinetics -> artifacts).

Run anywhere:

    python examples/single_trial.py [workdir]

A synthetic trial is rendered (from a shipped reference trajectory when
/root/reference is present, else a procedural gallop), then the full staged
pipeline runs and prints the reconstruction metrics.
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk
from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod
from cheetah_pose_estimation_tpu.pipeline import metrics

REF_PICKLE = ("/root/reference/data/test_set/2019_03_07/phantom/run/"
              "fte_kinematic/fte.pickle")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "./example_trial"
    data_path = os.path.join("2019_03_07", "phantom", "run")
    subject_name = "phantom"
    if os.path.exists(REF_PICKLE):
        with open(REF_PICKLE, "rb") as f:
            q_gt = pickle.load(f)["q"]
    else:
        q_gt = syn.gallop_trajectory(60, seed=0)
        subject_name = "acinoset"
    subject = P.get_subject(subject_name)
    markers = np.asarray(sk.fk_markers(q_gt, subject))
    scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=6, seed=3)
    trial = syn.synthesize(q_gt, subject, scene, noise_px=1.5, seed=3)
    syn.write_trial_dir(trial, root, data_path, monocular_cam=2)
    print(f"trial materialized under {root}/{data_path}")

    # 1) multi-view kinematic FTE
    est = est_mod.init_trajectory(root, data_path, subject_name,
                                  kinematic_model=True)
    est_mod.estimate_kinematics(est, solver_output=True)
    d = dio.load_fte_pickle(os.path.join(root, data_path, "fte_kinematic",
                                         "fte.pickle"))
    err = np.linalg.norm(d["positions"] - trial.markers_gt, axis=2)
    print(f"multi-view kinematic MPE vs synthetic GT: "
          f"{err.mean() * 1000:.1f} mm")

    # 2) contact detection + GRF synthesis
    est2 = est_mod.init_trajectory(root, data_path, subject_name,
                                   kinematic_model=False)
    contacts, _ = est_mod.determine_contacts(est2)
    print("contacts:", {k: v for k, v in contacts.items()})

    # 3) physics-based FTE with joint torque/GRF estimation
    est_mod.estimate_kinetics(est2, joint_estimation=True, solver_output=True)
    print(f"peak vertical GRF: {est2.grf_z.max():.2f} body weights; "
          f"|tau|max: {np.abs(est2.tau).max():.1f}")

    # 4) monocular modes + scoring against the multi-view solution
    est3 = est_mod.init_trajectory(root, data_path, subject_name,
                                   kinematic_model=True,
                                   monocular_enable=True)
    est_mod.estimate_kinematics(est3)
    est4 = est_mod.init_trajectory(root, data_path, subject_name,
                                   kinematic_model=True,
                                   monocular_enable=True)
    est_mod.estimate_kinematics(est4, monocular_constraints=True)
    scores = metrics.compare_traj_error(os.path.join(root, data_path),
                                        cam_idx=2, save_plots=False)
    for mode, vals in scores.items():
        print(f"{mode}: MPE {vals['mpe_mm']:.1f} mm, "
              f"MPJPE {vals['mpjpe_mm']:.1f} mm")


if __name__ == "__main__":
    main()
