"""File-based pipeline round trip: write an AcinoSet-style trial dir, run
init_trajectory + estimate_kinematics, verify the fte.pickle / cam*_fte
artifacts and reconstruction quality."""
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk
from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod

REF_PICKLE = ("/root/reference/data/test_set/2019_03_07/phantom/run/"
              "fte_kinematic/fte.pickle")


@pytest.fixture(scope="module")
def trial_dir(tmp_path_factory):
    if not os.path.exists(REF_PICKLE):
        pytest.skip("reference pickle unavailable")
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


def test_dlc_roundtrip(trial_dir):
    root, data_path, trial = trial_dir
    xy, lik, bodyparts = dio.load_dlc_points(
        os.path.join(root, data_path, "dlc"))
    assert list(bodyparts) == list(sk.MARKERS)
    # native loader returns float32: sub-milli-pixel rounding is expected
    np.testing.assert_allclose(xy, trial.meas[..., 0], rtol=0, atol=1e-3)
    np.testing.assert_allclose(lik, trial.likelihood[..., 0], rtol=0,
                               atol=1e-6)


def test_scene_roundtrip(trial_dir):
    root, data_path, trial = trial_dir
    k, d, r, t, res, n_cams, fpath = dio.find_scene_file(
        os.path.join(root, data_path))
    assert n_cams == 6 and res == tuple(trial.scene.cam_res)
    np.testing.assert_allclose(k, trial.scene.K)
    np.testing.assert_allclose(d.reshape(-1, 4), trial.scene.D)
    np.testing.assert_allclose(r, trial.scene.R)
    np.testing.assert_allclose(t.reshape(-1, 3), trial.scene.t)


@pytest.mark.slow
def test_multiview_pipeline_end_to_end(trial_dir):
    root, data_path, trial = trial_dir
    est = est_mod.init_trajectory(root, data_path, "phantom",
                                  kinematic_model=True)
    assert est.scene.n_cams == 6
    ok = est_mod.estimate_kinematics(est, solver_output=True)
    assert ok
    out = os.path.join(root, data_path, "fte_kinematic")
    d = dio.load_fte_pickle(os.path.join(out, "fte.pickle"))
    # schema parity with the reference artifact
    with open(REF_PICKLE, "rb") as f:
        ref = pickle.load(f)
    assert set(d.keys()) == set(ref.keys())
    N = trial.q_gt.shape[0]
    assert d["positions"].shape == (N, 24, 3)
    assert d["q"].shape == (N, 54) and d["x"].shape == (N, 28)
    assert d["com_vel"].shape == (N - 1, 3)
    assert d["meas_err"].shape == (N, 6, 24, 2, 1)
    # reconstruction quality vs synthetic GT
    err = np.linalg.norm(d["positions"] - trial.markers_gt, axis=2)
    assert err.mean() * 1000 < 12.0, err.mean() * 1000
    # derivative consistency: q integrates dq (implicit Euler)
    h = 1.0 / est.scene.fps
    np.testing.assert_allclose(d["q"][1:], d["q"][:-1] + h * d["dq"][1:],
                               atol=1e-8)
    np.testing.assert_allclose(d["dq"][1:], d["dq"][:-1] + h * d["ddq"][1:],
                               atol=1e-8)
    # reprojection tables exist and carry finite pixels
    tab = dio.load_reprojection_table(os.path.join(out, "cam1_fte.csv"))
    assert np.isfinite(tab.to_numpy().astype(float)).mean() > 0.5


@pytest.mark.slow
def test_monocular_pipeline(trial_dir):
    root, data_path, trial = trial_dir
    est = est_mod.init_trajectory(root, data_path, "phantom",
                                  kinematic_model=True, monocular_enable=True)
    assert est.scene.cam_idx == 2
    ok = est_mod.estimate_kinematics(est)
    assert ok
    out = os.path.join(root, data_path, "fte_kinematic_orig_2")
    d = dio.load_fte_pickle(os.path.join(out, "fte.pickle"))
    err = np.linalg.norm(d["positions"] - trial.markers_gt, axis=2)
    assert err.mean() * 1000 < 400.0
