"""Pairwise pseudo-measurements (W = 3): round trip and solver benefit."""
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.data import ppm as ppm_mod
from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk
from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod

REF_PICKLE = ("/root/reference/data/test_set/2019_03_07/phantom/run/"
              "fte_kinematic/fte.pickle")
pytestmark = pytest.mark.skipif(not os.path.exists(REF_PICKLE),
                                reason="reference pickle unavailable")


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    markers_px = rng.normal(size=(10, 24, 2)) * 300 + 900
    lik = rng.uniform(0.6, 1.0, size=(10, 24))
    pose, plik, pws = ppm_mod.synthesize_ppm(markers_px, lik, noise_px=0.0,
                                             seed=1)
    p = str(tmp_path / "cam1.pickle")
    ppm_mod.save_ppm_pickle(p, pose, plik, pws)
    frames = ppm_mod.load_ppm_pickle(p)
    assert len(frames) == 10
    meas, weight = ppm_mod.assemble_ppm_measurements(
        markers_px[:, None], lik[:, None], [frames], 0, 10)
    assert meas.shape == (10, 1, 24, 2, 3)
    # zero-noise pseudo-measurements reconstruct the true marker positions
    for w in (1, 2):
        err = np.abs(meas[..., w] - markers_px[:, None])
        assert np.nanmax(err) < 1e-6, (w, np.nanmax(err))
    assert (weight[..., 1:] > 0).mean() > 0.9


@pytest.mark.slow
def test_ppm_pipeline_improves_dropout_robustness(tmp_path):
    """With most base detections dropped, the pairwise channels must carry
    the reconstruction (reference enables PPMs for flick trials,
    run_dataset.py:1323)."""
    with open(REF_PICKLE, "rb") as f:
        q_gt = pickle.load(f)["q"]
    subject = P.get_subject("phantom")
    markers = np.asarray(sk.fk_markers(q_gt, subject))
    scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=6, seed=3)
    trial = syn.synthesize(q_gt, subject, scene, noise_px=1.5,
                           outlier_frac=0.0, drop_frac=0.45, seed=3)
    root = str(tmp_path)
    data_path = "2019_03_07/phantom/run"
    syn.write_trial_dir(trial, root, data_path, monocular_cam=2,
                        write_ppm=True)

    def run(enable_ppm):
        est = est_mod.init_trajectory(root, data_path, "phantom",
                                      kinematic_model=True,
                                      enable_ppm=enable_ppm)
        ok = est_mod.estimate_kinematics(est, save=False)
        assert ok
        rec = np.asarray(sk.fk_markers(est.q, subject))
        return np.mean(np.linalg.norm(rec - trial.markers_gt, axis=2)) * 1e3

    err_base = run(False)
    err_ppm = run(True)
    print(f"multiview 45%-dropout: base {err_base:.1f} mm, "
          f"ppm {err_ppm:.1f} mm")
    assert err_ppm < err_base * 1.02
    assert err_ppm < 40.0


def test_pw_pickle_layout_variants(tmp_path):
    """Dict-keyed pairwise pickles (int keys or DLC-style 'frameNNNN' keys,
    with 'coordinates'+'confidence' instead of a flat 'pose') normalize to
    the frame-indexable list layout the reference consumes."""
    rng = np.random.default_rng(2)
    markers_px = rng.normal(size=(4, 24, 2)) * 200 + 800
    lik = rng.uniform(0.6, 1.0, size=(4, 24))
    pose, plik, pws = ppm_mod.synthesize_ppm(markers_px, lik, noise_px=0.0,
                                             seed=2)
    canonical = []
    for t in range(4):
        flat = np.concatenate([pose[t], plik[t][:, None]],
                              axis=1).reshape(-1)
        canonical.append({"pose": flat, "pws": pws[t][None]})

    as_int_dict = {t: {"pose": canonical[t]["pose"], "pws": pws[t]}
                   for t in range(4)}  # (P,P,2) without leading singleton
    as_frame_dict = {"metadata": {"nframes": 4}}
    for t in range(4):
        as_frame_dict[f"frame{t:04d}"] = {
            "coordinates": pose[t], "confidence": plik[t],
            "pairwise": pws[t][None]}

    for variant in (canonical, as_int_dict, as_frame_dict):
        frames = ppm_mod.normalize_pw_frames(
            pickle.loads(pickle.dumps(variant)))
        assert len(frames) == 4
        for t in range(4):
            assert frames[t]["pws"].shape == pws[t][None].shape
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(frames[t]["pose"], float)),
                np.nan_to_num(canonical[t]["pose"]), atol=1e-12)
