"""Kinetic-dataset (2009 force-plate rig) path: pinhole cameras at 200 fps,
full run_kinetic staged pipeline on a synthetic trial."""
import os

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.pipeline import run_dataset as rd

REF = "/root/reference/data/test_set/kinetic_dataset"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference test_set missing")]


def test_run_kinetic_single_trial(tmp_path):
    root = str(tmp_path / "videos")
    out = str(tmp_path / "out")
    made = rd.materialize_synthetic_kinetic_testset(root)
    assert len(made) == 5
    one = rd.KINETIC_SET[1:2]  # shiraz 2009_09_07 trial04
    rd.run_kinetic(root, out, kinetic_set=one, verbose=False)
    data_path = os.path.join("kinetic_dataset", "2009_09_07", "shiraz",
                             "trial04")
    base = os.path.join(out, data_path)
    for sub in ("fte_kinematic", "fte_kinetic", "fte_grf"):
        p = os.path.join(base, sub, "fte.pickle")
        assert os.path.exists(p), sub
    # score against the synthetic ground truth
    import pickle
    with open(os.path.join(root, data_path, "synthetic_gt.pickle"),
              "rb") as f:
        gt = pickle.load(f)
    d = dio.load_fte_pickle(os.path.join(base, "fte_kinematic",
                                         "fte.pickle"))
    err = np.linalg.norm(d["positions"] - gt["positions"], axis=2)
    assert err.mean() * 1000 < 20.0, err.mean() * 1000
    dk = dio.load_fte_pickle(os.path.join(base, "fte_kinetic", "fte.pickle"))
    errk = np.linalg.norm(dk["positions"] - gt["positions"], axis=2)
    assert errk.mean() * 1000 < 40.0, errk.mean() * 1000
    # analysis layer runs over the outputs
    analysis = rd.kinetic_analysis(root, out, kinetic_set=one)
    assert os.path.exists(os.path.join(base, "torques.pdf"))
