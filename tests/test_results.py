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
    # polygon complementarity: opposite directions never both active
    gxy = np.zeros((3, 4, 4))
    gxy[0, 0, 0] = 0.5            # +x only: ok
    gxy[1, 1, 1] = 0.2            # +y only: ok
    r = R.check_grf(gxy)
    assert r["ok"]
    gxy[2, 2, 0] = 0.1
    gxy[2, 2, 2] = 0.1            # +x AND -x: invalid
    r = R.check_grf(gxy)
    assert not r["ok"] and r["n_invalid"] == 1
    # ground complementarity (epsilon-LCP target)
    gz = np.array([[1.0, 0.0], [0.5, 0.0]])
    fh = np.array([[0.0, 0.2], [0.001, 0.3]])
    assert R.check_lcp(gz, fh)["ok"]
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


def test_power_values_energy_consistency(tmp_path):
    """Power traces: a single actuated joint rotating at constant rate under
    constant torque has power = tau * omega at every frame."""
    from cheetah_pose_estimation_tpu.dynamics.eom import TORQUE_MAP
    fps = 100.0
    N = 20
    q = np.zeros((N, 54))
    col = TORQUE_MAP.names.index("UFL_LFL_torque:y")
    b = TORQUE_MAP.B[:, col]
    (j,) = np.nonzero(b == 1.0)
    omega = 2.0
    q[:, j[0]] = omega * np.arange(N) / fps
    tau = np.zeros((N, len(TORQUE_MAP.names)))
    tau[:, col] = 3.0
    power = R.get_power_values(q, tau, fps)
    p = power["UFL_LFL_torque"]
    # interior frames see the exact constant rate (np.gradient is exact for
    # a linear ramp)
    np.testing.assert_allclose(p[1:-1, 0], 3.0 * omega, rtol=1e-9)
    # every other motor does no work
    for k, v in power.items():
        if k != "UFL_LFL_torque":
            np.testing.assert_allclose(v, 0.0, atol=1e-12)
    stats = R.plot_power_values(q, tau, fps, str(tmp_path / "p.pdf"))
    assert stats["peak"] == pytest.approx(3.0 * omega, rel=1e-6)
    assert os.path.exists(tmp_path / "p.pdf")


def test_torque_error_and_align_bands(tmp_path):
    t1 = np.ones((10, 4))
    t2 = np.zeros((12, 4))
    per_col, a, b = R.torque_error(t1, t2)
    np.testing.assert_allclose(per_col, 1.0)
    assert a.shape == b.shape == (10, 4)
    trajs = [np.linspace(0, 1, n) for n in (5, 9, 17)]
    n, interp, mean, std, med, lq, uq, mad = R.align_error_trajectories(trajs)
    assert n == 17 and interp.shape == (3, 17)
    np.testing.assert_allclose(med, np.linspace(0, 1, 17), atol=1e-12)
    np.testing.assert_allclose(mad, 0.0, atol=1e-12)
    out = tmp_path / "bands.pdf"
    R.align_error_and_plot([t + 1 for t in trajs], trajs,
                           [t * 2 for t in trajs], str(out))
    assert out.exists()


def test_save_error_dists(tmp_path):
    rng = np.random.default_rng(0)
    px = {0: rng.uniform(0, 5, 100), 2: rng.uniform(0, 8, 50)}
    mean, med = R.save_error_dists(px, str(tmp_path))
    allv = np.concatenate([px[0], px[2]])
    assert mean == pytest.approx(float(np.mean(allv)))
    assert med == pytest.approx(float(np.median(allv)))
    assert (tmp_path / "reprojection.pickle").exists()
    assert (tmp_path / "overall_error_hist.pdf").exists()
    assert (tmp_path / "cams_error_hist.pdf").exists()
    with open(tmp_path / "reprojection.pickle", "rb") as f:
        d = pickle.load(f)
    assert set(d) == {"error", "mean_error", "med_error"}


def test_std_dev_and_model_selection_plots(tmp_path):
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(10, 3))
    assert R.std_dev(pred, pred) == 0.0
    assert R.std_dev(pred + 1.0, pred) == pytest.approx(0.0, abs=1e-12)
    # data_driven_analysis plots from a grid_search.pickle
    from cheetah_pose_estimation_tpu.utils import data_ops
    nw = 7
    data = {"gmm_train_likelihood": list(range(7)),
            "gmm_validation_likelihood": list(range(7)),
            "lr_train_rmse": list(np.linspace(1, 0.5, 2 * nw)),
            "lr_validation_rmse": list(np.linspace(1.2, 0.6, 2 * nw)),
            "lr_non_zeros": list(range(2 * nw))}
    data_ops.save_pickle(str(tmp_path / "grid_search.pickle"), data)
    out = R.data_driven_analysis(str(tmp_path))
    assert out["gmm_train_likelihood"] == data["gmm_train_likelihood"]
    assert (tmp_path / "gmm_model_selection.pdf").exists()
    assert (tmp_path / "ar_model_selection.pdf").exists()


def test_animate_torque_plot(tmp_path):
    rng = np.random.default_rng(1)
    tau = {"hip": rng.normal(size=(6, 2)), "knee": rng.normal(size=(6, 1))}
    out = tmp_path / "torque.gif"
    R.animate_torque_plot(tau, fps=10.0, out_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_example_robustness(tmp_path):
    # synthesize fte pickles for two cameras and the multi-view GT
    rng = np.random.default_rng(2)
    from cheetah_pose_estimation_tpu.utils import data_ops
    base = tmp_path / "2019_03_07" / "phantom" / "run"
    gt = rng.normal(size=(8, 24, 3))
    (base / "fte_kinematic").mkdir(parents=True)
    data_ops.save_pickle(str(base / "fte_kinematic" / "fte.pickle"),
                         {"positions": gt})
    for cam in (0, 1):
        for sub, sigma in (("fte_kinematic_orig", 0.05),
                           ("fte_kinematic", 0.02), ("fte_kinetic", 0.03)):
            d = base / f"{sub}_{cam}"
            d.mkdir()
            data_ops.save_pickle(str(d / "fte.pickle"),
                                 {"positions": gt + rng.normal(
                                     0, sigma, gt.shape)})
    vals = R.example_robustness(str(tmp_path), str(tmp_path),
                                cam_space=(0, 1, 2))
    assert len(vals["single_traj_error"]) == 2
    # data-driven (tighter noise) must score better than default
    assert np.mean(vals["data_driven_traj_error"]) < \
        np.mean(vals["single_traj_error"])
    assert (tmp_path / "example-cam-robustness.pdf").exists()


def test_check_joint_estimation(tmp_path):
    rng = np.random.default_rng(3)
    from cheetah_pose_estimation_tpu.utils import data_ops
    pos = rng.normal(size=(8, 24, 3))
    tau_gt = {"hip": rng.normal(size=(8, 2)), "knee": rng.normal(size=(8,))}
    # the comparison solution has MORE frames and reordered keys — the
    # per-motor alignment must still give a sane RMSE
    tau = {"knee": np.concatenate([tau_gt["knee"], np.zeros(3)]),
           "hip": np.concatenate([tau_gt["hip"] + 0.5,
                                  np.zeros((3, 2))], axis=0)}
    for root, t in (("gt", tau_gt), ("est", tau)):
        d = tmp_path / root / "kinetic_dataset" / "2009_09_08" / "shiraz" \
            / "trial04" / "fte_kinetic"
        d.mkdir(parents=True)
        n = len(next(iter(t.values())))
        data_ops.save_pickle(str(d / "fte.pickle"),
                             {"positions": pos[: min(n, 8)], "tau": t})
    out = R.check_joint_estimation(str(tmp_path / "est"),
                                   str(tmp_path / "gt"))
    # hip differs by exactly 0.5 on the overlapping frames, knee by 0
    expected = np.sqrt(np.mean(np.concatenate(
        [np.full(16, 0.25), np.zeros(8)])))
    assert out["torque_rmse"] == pytest.approx(expected, rel=1e-6)
    assert out["mpjpe_mm"] == pytest.approx(0.0, abs=1e-9)
