"""Batched pipeline: vmapped group solve matches the serial path's quality."""
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.pipeline import batched as batched_mod
from cheetah_pose_estimation_tpu.pipeline import run_dataset as rd

REF = "/root/reference/data/test_set"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference test_set missing")


def test_batched_matches_quality(tmp_path):
    root = str(tmp_path / "videos")
    out = str(tmp_path / "out")
    rd.materialize_synthetic_testset(root)
    subset = rd.TEST_SET[1:4]  # jules flick1, phantom run x2 -> 2 groups
    timings = batched_mod.run_monocular_batched(
        root, out, subset, modes=("ground-truth", "default"))
    assert set(timings) == {"ground-truth", "default"}
    for cheetah, date, trial in subset:
        data_path = os.path.join(date, cheetah, trial)
        with open(os.path.join(root, data_path, "synthetic_gt.pickle"),
                  "rb") as f:
            gt = pickle.load(f)
        d = dio.load_fte_pickle(os.path.join(out, data_path,
                                             "fte_kinematic", "fte.pickle"))
        err = np.linalg.norm(d["positions"] - gt["positions"],
                             axis=2).mean() * 1000
        assert err < 15.0, (data_path, err)
        dm = dio.load_fte_pickle(os.path.join(
            out, data_path, "fte_kinematic_orig_2", "fte.pickle"))
        errm = np.linalg.norm(dm["positions"] - gt["positions"],
                              axis=2).mean() * 1000
        assert errm < 500.0, (data_path, errm)
