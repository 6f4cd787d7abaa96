"""Ground-plane elevation threading (reference metadata ground_plane_height,
acinoset_opt.py:464-472,500).

AcinoSet world frames do NOT put the ground at z=0: the reference's shipped
2017 solutions have their feet bottoming out near +0.05..0.15 m and the 2019
ones near -0.1 m. Round-2 regression: contact detection and the kinetic
stance anchoring must use the trial's ground elevation, not z=0 — with the
plane hard-coded to 0 the 2017 trials detect NO stance at all (the physics
stage then demands whole-trial ballistic flight) and the 2019 trials anchor
stance feet 10 cm above the true ground.
"""
import glob
import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.pipeline import contacts as cmod
from cheetah_pose_estimation_tpu.solver import kinematic as kin
from cheetah_pose_estimation_tpu.solver import kinetic as kn

REF_TEST_SET = "/root/reference/data/test_set"
TRIAL_2017 = os.path.join(REF_TEST_SET, "2017_08_29/top/jules/run1_1",
                          "fte_kinematic", "fte.pickle")

pytestmark = pytest.mark.skipif(not os.path.exists(TRIAL_2017),
                                reason="reference test set unavailable")


def _gt_q(path):
    with open(path, "rb") as f:
        return np.asarray(pickle.load(f)["q"], np.float64)


def test_reference_frames_have_elevated_ground():
    q = _gt_q(TRIAL_2017)
    subject = P.get_subject("jules")
    gph = cmod.estimate_ground_height(q, subject)
    assert gph > 0.03, gph  # the 2017 frames sit well above z=0


def test_contact_detection_needs_ground_height():
    q = _gt_q(TRIAL_2017)
    subject = P.get_subject("jules")
    fps = 90.0
    dq = np.zeros_like(q)
    dq[1:] = (q[1:] - q[:-1]) * fps
    gph = cmod.estimate_ground_height(q, subject)
    c0, _ = cmod.contact_detection(q, dq, subject, 0, 12.0, fps,
                                   ground_plane_height=0.0)
    cg, _ = cmod.contact_detection(q, dq, subject, 0, 12.0, fps,
                                   ground_plane_height=gph)
    n0 = sum(len(v) for v in c0.values() if v)
    ng = sum(len(v) for v in cg.values() if v)
    # z=0 detection is blind on this trial; the elevated plane finds stance
    assert n0 == 0, c0
    assert ng >= 2, cg


def test_stance_penalty_anchors_to_ground_plane():
    """At the true (dynamically consistent) trajectory, stance penalties
    must be near zero with the correct ground elevation and pruned windows,
    and fire hard with ground_z=0."""
    q = _gt_q(os.path.join(os.path.dirname(os.path.dirname(TRIAL_2017)),
                           "fte_kinetic_1", "fte.pickle"))
    subject = P.get_subject("jules")
    fps = 90.0
    N = len(q)
    gph = cmod.estimate_ground_height(q, subject)
    dq = np.zeros_like(q)
    dq[1:] = (q[1:] - q[:-1]) * fps
    contacts, _ = cmod.contact_detection(q, dq, subject, 0, 12.0, fps,
                                         ground_plane_height=gph)
    stance = kn.stance_matrix(contacts, 0, N)
    stance = kn.prune_stance(stance, q, subject, 1.0 / fps)
    assert stance.sum() > 0
    gmmp = kin.GMMPrior(np.zeros((1, 22)), np.eye(22)[None], np.zeros(1))
    ar = kin.ARAnchor(np.zeros((N, 28)), np.zeros(28), np.zeros(N))
    cam = kin.CameraSet(np.eye(3)[None], np.zeros((1, 4)),
                        np.eye(3)[None], np.zeros((1, 3)))
    data = kin.KinematicData(
        meas=np.zeros((N, 1, 24, 2, 1)), weight=np.zeros((N, 1, 24, 2, 1)),
        cam=cam, h=np.asarray(1.0 / fps),
        acc_weight=np.ones(54), frame_valid=np.ones(N), gmm=gmmp, ar=ar)
    fte = kn.KineticFTE(kn.KineticConfig(), subject)

    def pen(gz):
        kd = kn.KineticData(base=data, stance=jnp.asarray(stance),
                            grf_fixed=jnp.zeros((N, 4)),
                            grf_xy_fixed=jnp.zeros((N, 4, 4)),
                            use_fixed_grf=jnp.asarray(0.0),
                            q_warm=jnp.asarray(q),
                            ground_z=jnp.asarray(gz))
        return float(fte._stance_penalties(jnp.asarray(q), kd))

    p_good = pen(gph)
    p_off = pen(gph - 0.25)
    # pruned stance on the true plane: only sub-1.5 m/s residual slip from
    # the reference solve's own foot drift remains (order 1e2, not 1e4+)
    assert p_good < 1.5e3, p_good
    # a plane outside the +-0.1 m box must make the height anchor fire:
    # proves ground_z reaches the penalty (the +-0.1 box deliberately
    # swallows sub-0.1 offsets, matching the reference's uncertainty bound).
    # The slip term is ground-independent, so compare the difference: ~20
    # stance frames x 1e4 x (0.15 m excess)^2 ~ 4e3.
    assert p_off - p_good > 3e3, (p_off, p_good)


def test_metadata_roundtrip_threads_ground_height(tmp_path):
    """materialize -> init_trajectory -> TrajectoryParams.ground_plane_height."""
    from cheetah_pose_estimation_tpu.data import synthetic as syn
    from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod

    q = _gt_q(TRIAL_2017)[:8]
    subject = P.get_subject("jules")
    trial = syn.synthesize(q, subject, noise_px=1.0, outlier_frac=0.0,
                           seed=0, subject_name="jules")
    gph = cmod.estimate_ground_height(q, subject)
    syn.write_trial_dir(trial, str(tmp_path), "d/jules/t1", monocular_cam=1,
                        ground_plane_height=gph)
    est = est_mod.init_trajectory(str(tmp_path), "d/jules/t1", "jules",
                                  monocular_enable=True)
    assert est.params.ground_plane_height == pytest.approx(gph)
    # explicit frame windows must not drop the scene facts
    est2 = est_mod.init_trajectory(str(tmp_path), "d/jules/t1", "jules",
                                   start_frame=0, end_frame=8)
    assert est2.params.ground_plane_height == pytest.approx(gph)
