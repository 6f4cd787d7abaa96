"""Shutter-delay estimation: recover known per-camera delays on synthetic
data (reference acinoset_misc.py:180-286)."""
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk
from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod

REF_PICKLE = ("/root/reference/data/test_set/2019_03_07/phantom/run/"
              "fte_kinematic/fte.pickle")
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(REF_PICKLE),
                                reason="reference pickle unavailable")]


def test_recovers_injected_delays(tmp_path):
    with open(REF_PICKLE, "rb") as f:
        q_gt = pickle.load(f)["q"]
    subject = P.get_subject("phantom")
    markers = np.asarray(sk.fk_markers(q_gt, subject))
    scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=4, seed=3)
    trial = syn.synthesize(q_gt, subject, scene, noise_px=1.0,
                           outlier_frac=0.0, drop_frac=0.0, seed=3)
    # inject a known delay on camera 2: shift its detections along the
    # motion by tau * image-velocity
    h = 1.0 / scene.fps
    true_tau = 0.4 * h
    meas = np.array(trial.meas)
    vel_px = np.zeros_like(meas[..., 0])
    vel_px[1:] = (meas[1:, ..., 0] - meas[:-1, ..., 0]) / h
    meas[:, 2, :, :, 0] += true_tau * vel_px[:, 2]
    trial = trial._replace(meas=meas)
    root = str(tmp_path)
    data_path = "2019_03_07/phantom/run"
    syn.write_trial_dir(trial, root, data_path)

    est = est_mod.init_trajectory(root, data_path, "phantom",
                                  kinematic_model=True,
                                  shutter_delay_estimation=True)
    ok = est_mod.estimate_kinematics(est, save=False)
    assert ok
    tau = est.shutter_delay
    assert tau is not None
    assert tau[0] == 0.0
    # only RELATIVE delays are identifiable (the trajectory itself shifts in
    # time to split the difference): camera 2's delay relative to the other
    # movable cameras must match the injected value. The joint bordered
    # solve recovers it to ~1e-4 of a frame period; assert well sub-frame.
    rel = tau[2] - 0.5 * (tau[1] + tau[3])
    assert abs(rel - true_tau) < 0.05 * h, (tau, rel, true_tau)
    assert all(abs(t) < 0.15 * h for t in (tau[1], tau[3])), tau
