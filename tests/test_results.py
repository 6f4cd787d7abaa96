"""Results/analysis layer unit tests."""
import json
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.pipeline import metrics as M
from cheetah_pose_estimation_tpu.pipeline import results as R

TRIAL = "/root/reference/data/test_set/2019_03_07/phantom/run"
needs_ref = pytest.mark.skipif(not os.path.isdir(TRIAL),
                               reason="reference test_set missing")


def test_traj_error_basic():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(10, 24, 3))
    Y = X + 0.001
    tbl, frame_err, smooth = M.traj_error(X.copy(), Y.copy(), verbose=False)
    np.testing.assert_allclose(tbl["mpjpe (mm)"].to_numpy(),
                               np.sqrt(3) * 1.0, rtol=1e-6)
    assert frame_err.shape == (10,)
    assert smooth < 1e-9
    # centered: a constant offset vanishes
    tblc, _, _ = M.traj_error(X.copy(), (X + 5.0).copy(), centered=True,
                              verbose=False)
    np.testing.assert_allclose(tblc.to_numpy(), 0.0, atol=1e-9)


@needs_ref
def test_traj_error_reference_consistency():
    """Scoring the multi-view solution against the shipped data-driven
    solution must reproduce the dataset_results.csv numbers for this trial."""
    import pandas as pd
    gt = pickle.load(open(os.path.join(TRIAL, "fte_kinematic",
                                       "fte.pickle"), "rb"))["positions"]
    dd = pickle.load(open(os.path.join(TRIAL, "fte_kinematic_1",
                                       "fte.pickle"), "rb"))["positions"]
    tbl, _, smooth = M.traj_error(gt.copy(), dd.copy(), verbose=False)
    tblc, _, _ = M.traj_error(gt.copy(), dd.copy(), centered=True,
                              verbose=False)
    csv = pd.read_csv("/root/reference/data/test_set/dataset_results.csv",
                      header=[0, 1], index_col=0)
    col = ("2019_03_07/phantom/run", "data-driven")
    ref_mpe = float(csv.loc["mpe", col])
    ref_mpjpe = float(csv.loc["mpjpe", col])
    ref_smooth = float(csv.loc["smoothness error", col])
    assert abs(float(tbl.mean().iloc[0]) - ref_mpe) < 0.06
    assert abs(float(tblc.mean().iloc[0]) - ref_mpjpe) < 0.06
    assert abs(smooth - ref_smooth) < 0.06


@needs_ref
def test_contact_json_conversion_and_gait():
    path = os.path.join(TRIAL, "grf", "autogen-contact.json")
    conv = R.contact_json_conversion(path)
    assert set(conv) == {"forelimb-trailing", "forelimb-leading",
                         "hindlimb-leading", "hindlimb-trailing"}
    d = pickle.load(open(os.path.join(TRIAL, "fte_kinetic_1", "fte.pickle"),
                         "rb"))
    # assemble a (N, 22) tau array from the shipped dict for the analysis
    from cheetah_pose_estimation_tpu.dynamics.eom import TORQUE_MAP
    N = d["q"].shape[0]
    tau = np.zeros((N, 22))
    col = 0
    for name in TORQUE_MAP.names:
        motor, ax = name.rsplit(":", 1)
        comp = {"x": 0, "y": 1, "z": 2}
        arr = d["tau"][motor]
        # per-motor component ordering follows the axes string used at
        # construction; index within this motor:
        idx = [n for n in TORQUE_MAP.names if n.startswith(motor + ":")
               ].index(name)
        tau[:, col] = arr[:, idx]
        col += 1
    analysis = R.gait_analysis(d["q"], tau, path, fps=120.0)
    assert analysis["angle"], "no stance curves produced"
    for k, v in analysis["angle"].items():
        assert v.shape == (101,)
        assert np.isfinite(v).all()
    assert analysis["torque"] and analysis["power"]


def test_check_grf_and_contact_scoring():
    gz = np.array([[1.0, 0.0], [0.5, 0.0]])
    fh = np.array([[0.0, 0.2], [0.001, 0.3]])
    r = R.check_grf(gz, fh)
    assert r["ok"]
    pred = {"HFL_foot": [[10, 20, 0, "leading"]], "HFR_foot": None,
            "HBL_foot": None, "HBR_foot": None}
    ref = {"HFL_foot": [[12, 20, 0, "leading"]], "HFR_foot": None,
           "HBL_foot": None, "HBR_foot": None}
    s = R.contact_detection_analysis(pred, ref, n_frames=40, start_frame=0)
    assert 0.7 < s["precision"] <= 1.0
    assert s["recall"] == 1.0


def test_stance_normalized():
    x = np.arange(50, dtype=float)
    c = R.stance_normalized(x, 10, 20)
    assert c.shape == (101,)
    np.testing.assert_allclose(c[0], 10.0)
    np.testing.assert_allclose(c[-1], 19.0)
