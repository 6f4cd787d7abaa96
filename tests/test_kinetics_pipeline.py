"""Full physics-based pipeline: kinematics -> contacts -> kinetics, file-based,
mirroring the reference's run_monocular trial loop (run_dataset.py:1143-1231)."""
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.dynamics.eom import FOOT_NAMES
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk
from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod

REF_PICKLE = ("/root/reference/data/test_set/2019_03_07/phantom/run/"
              "fte_kinematic/fte.pickle")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(REF_PICKLE),
                                reason="reference pickle unavailable")]


@pytest.fixture(scope="module")
def trial_dir(tmp_path_factory):
    with open(REF_PICKLE, "rb") as f:
        q_gt = pickle.load(f)["q"]
    subject = P.get_subject("phantom")
    markers = np.asarray(sk.fk_markers(q_gt, subject))
    scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=6, seed=3)
    trial = syn.synthesize(q_gt, subject, scene, noise_px=1.5,
                           outlier_frac=0.02, seed=3)
    root = str(tmp_path_factory.mktemp("acinoset"))
    data_path = os.path.join("2019_03_07", "phantom", "run")
    syn.write_trial_dir(trial, root, data_path, monocular_cam=2)
    return root, data_path, trial


def test_multiview_kinetics_end_to_end(trial_dir):
    root, data_path, trial = trial_dir
    # stage 1: multi-view kinematics (ground-truth stage)
    est = est_mod.init_trajectory(root, data_path, "phantom",
                                  kinematic_model=True)
    assert est_mod.estimate_kinematics(est)
    # stage 2: contacts + synth GRF
    est2 = est_mod.init_trajectory(root, data_path, "phantom",
                                   kinematic_model=False)
    contacts, _ = est_mod.determine_contacts(est2)
    assert os.path.exists(os.path.join(root, data_path, "grf",
                                       "autogen-contact.json"))
    assert os.path.exists(os.path.join(root, data_path, "grf",
                                       "data_synth.h5"))
    # stage 3: physics-based with joint torque/GRF estimation
    ok = est_mod.estimate_kinetics(est2, joint_estimation=True,
                                   solver_output=True)
    assert ok
    out = os.path.join(root, data_path, "fte_kinetic")
    d = dio.load_fte_pickle(os.path.join(out, "fte.pickle"))
    N = trial.q_gt.shape[0]
    assert d["q"].shape == (N, 54)
    # tau dict schema matches the reference layout
    with open(REF_PICKLE.replace("fte_kinematic", "fte_kinetic_1"),
              "rb") as f:
        ref_kinetic = pickle.load(f)
    assert set(d["tau"].keys()) == set(ref_kinetic["tau"].keys())
    for k, v in d["tau"].items():
        assert v.shape == (N, ref_kinetic["tau"][k].shape[1]), k
    # physical plausibility: reconstruction close to GT, forces bounded
    err = np.linalg.norm(d["positions"] - trial.markers_gt, axis=2)
    assert err.mean() * 1000 < 25.0, err.mean() * 1000
    assert np.all(est2.grf_z >= 0)
    assert est2.grf_z.max() < 4.0          # body weights
    assert np.abs(est2.tau).max() < 50.0   # body-weight units
    # stance-only forces
    for i, name in enumerate(FOOT_NAMES):
        if contacts[name] is None:
            assert np.allclose(est2.grf_z[:, i], 0.0)
