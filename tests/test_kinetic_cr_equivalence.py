"""Kinetic-stage CR-vs-scan linear-solver equivalence (ADVICE r3 #2).

The kinematic stage has ``test_cr_linear_solver_equivalent``; the kinetic
stage runs a distinct solver regime — array ``diag_floor``, ``step_cap=
0.25``, measurement guard, flat welded-joint directions — none of which
the kinematic test exercises. Since round 3 flipped the production default
to "cr" (``KineticFTE.make_solver``), the two backends must follow the
same LM path on a real kinetic problem.
"""
import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import noise as nt
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.solver import kinematic as kin
from cheetah_pose_estimation_tpu.solver import kinetic as kn

REF_PICKLE = ("/root/reference/data/test_set/2019_03_07/phantom/run/"
              "fte_kinetic_1/fte.pickle")
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.exists(REF_PICKLE),
                                 reason="reference pickle unavailable")]


def _build_problem(N=20):
    subject = P.get_subject("phantom")
    fps = 120.0
    with open(REF_PICKLE, "rb") as f:
        q_gt = np.asarray(pickle.load(f)["q"])[:N]
    trial = syn.synthesize(q_gt, subject, noise_px=1.0, outlier_frac=0.0,
                           drop_frac=0.0, seed=7)
    sc = trial.scene
    ci = 2
    cam = kin.CameraSet(jnp.asarray(sc.K[ci:ci + 1]),
                        jnp.asarray(sc.D[ci:ci + 1]),
                        jnp.asarray(sc.R[ci:ci + 1]),
                        jnp.asarray(sc.t[ci:ci + 1]))
    w = syn.gated_weights(trial)[:, ci:ci + 1]
    gmmp = kin.GMMPrior(np.zeros((1, 22)), np.eye(22)[None], np.zeros(1))
    ar = kin.ARAnchor(np.zeros((N, 28)), np.zeros(28), np.zeros(N))
    data = kin.KinematicData(
        meas=jnp.asarray(trial.meas[:, ci:ci + 1]),
        weight=jnp.asarray(w), cam=cam, h=jnp.asarray(1.0 / fps),
        acc_weight=jnp.asarray(nt.acc_model_weights()),
        frame_valid=jnp.ones(N), gmm=gmmp, ar=ar)
    # mid-trial double-stance window keeps the GRF elimination columns live
    stance = np.zeros((N, 4))
    stance[N // 3: 2 * N // 3, :2] = 1.0
    rng = np.random.default_rng(5)
    q_warm = q_gt.copy()
    q_warm[:, :3] += 0.002 * rng.normal(size=(N, 3))
    kd = kn.KineticData(base=data, stance=jnp.asarray(stance),
                        grf_fixed=jnp.zeros((N, 4)),
                        grf_xy_fixed=jnp.zeros((N, 4, 4)),
                        use_fixed_grf=jnp.asarray(0.0),
                        q_warm=jnp.asarray(q_warm))
    return subject, kd, q_warm


def test_kinetic_cr_matches_scan():
    subject, kd, q_warm = _build_problem()
    fte = kn.KineticFTE(kn.KineticConfig(fisheye=True, robust=True),
                        subject)
    stages = ((3.0, 10), (1.0, 25))
    st_scan = fte.make_solver(stages=stages, linear_solver="scan")(
        jnp.asarray(q_warm), kd)
    st_cr = fte.make_solver(stages=stages, linear_solver="cr")(
        jnp.asarray(q_warm), kd)
    # in f64 (conftest) the accept/reject path must coincide step for step
    assert int(st_cr.n_accepted) == int(st_scan.n_accepted)
    np.testing.assert_allclose(np.asarray(st_cr.q), np.asarray(st_scan.q),
                               atol=1e-6)
    assert abs(float(st_cr.cost) - float(st_scan.cost)) \
        <= 1e-7 * max(1.0, float(st_scan.cost))
    # both must have genuinely optimized (not frozen on the warm start)
    assert int(st_scan.n_accepted) > 3
