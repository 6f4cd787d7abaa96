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


def test_joint_estimation_grf_floor_and_lcp(tmp_path):
    """Joint torque/GRF estimation with the prescribed-stance GRFz floor and
    the eps-relaxed LCP: no zero-force mid-stance frames (reference
    prescribe_contact_order min_GRFz, acinoset_misc.py:1143) and the
    complementarity check passes (reference check_grf, results.py:17-31)."""
    import json

    import jax
    import jax.numpy as jnp

    from cheetah_pose_estimation_tpu.dynamics import eom as dyn
    from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod
    from cheetah_pose_estimation_tpu.pipeline import results as results_mod
    from cheetah_pose_estimation_tpu.solver import kinetic as kn

    root = str(tmp_path / "videos")
    out = str(tmp_path / "out")
    rd.materialize_synthetic_kinetic_testset(root)
    cheetah, date, trial = rd.KINETIC_SET[1]
    data_path = os.path.join("kinetic_dataset", date, cheetah,
                             f"trial{trial}")
    est = est_mod.init_trajectory(root, data_path, cheetah,
                                  kinetic_dataset=True, kinematic_model=True)
    assert est_mod.estimate_kinematics(est, out_dir_prefix=out)
    est = est_mod.init_trajectory(root, data_path, cheetah,
                                  kinetic_dataset=True,
                                  kinematic_model=False)
    est_mod.determine_contacts(est, out_dir_prefix=out)
    assert est_mod.estimate_kinetics(est, joint_estimation=True,
                                     enable_lcp=True, out_dir_prefix=out)
    # reconstruct the pruned prescribed-stance schedule the solver used
    with open(os.path.join(out, data_path, "grf", "autogen-contact.json"),
              encoding="utf-8") as f:
        cj = json.load(f)
    warm = dio.load_fte_pickle(os.path.join(out, data_path, "fte_kinematic",
                                            "fte.pickle"))
    N = est.q.shape[0]
    stance = kn.stance_matrix(cj["contacts"], cj["start_frame"], N)
    stance = kn.prune_stance(stance, np.asarray(warm["q"]), est.subject,
                             1.0 / est.scene.fps)
    if stance.sum() > 0:
        # no zero-force mid-stance frames: the floor guarantees >= min_GRFz
        in_stance = stance > 0
        assert est.grf_z[in_stance].min() >= 0.009, \
            est.grf_z[in_stance].min()
    # friction-polygon complementarity (reference check_grf semantics)
    rep = results_mod.check_grf(est.grf_xy, tol=1e-4)
    assert rep["ok"], rep
    # ground complementarity: loaded feet near the ground (eps-LCP); soft
    # penalty, so assert the mean is small and the worst case bounded
    pts = np.asarray(jax.vmap(
        lambda qq: dyn.foot_points(qq, est.subject))(jnp.asarray(est.q)))
    lcp = results_mod.check_lcp(
        est.grf_z, pts[..., 2] - est.params.ground_plane_height)
    assert lcp["mean_violation"] < 0.02, lcp
    assert lcp["max_violation"] < 0.3, lcp
