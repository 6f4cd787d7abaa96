"""Regression for the round-1 'inert physics stage' defect: the kinetic
solver must actually optimize — reduce the EOM energy of a dynamically
inconsistent warm start by a large factor without sacrificing the
measurements. (With the full M^T M curvature instead of the
elimination-aware M^T P M kernel, steps in the ~34 actuated directions were
~we/ridge too small and the solver froze on its warm start.)"""
import os
import pickle

import numpy as np
import pytest

import jax
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


def test_kinetic_solver_reduces_eom_energy():
    subject = P.get_subject("phantom")
    fps = 120.0
    with open(REF_PICKLE, "rb") as f:
        q_gt = np.asarray(pickle.load(f)["q"])[:32]
    N = len(q_gt)
    trial = syn.synthesize(q_gt, subject, noise_px=1.0, outlier_frac=0.0,
                           drop_frac=0.0, seed=11)
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
    # high-frequency base perturbation: large accelerations (the EOM's
    # observable channel, unlike slow depth drift) on top of GT
    rng = np.random.default_rng(3)
    q_warm = np.asarray(q_gt, np.float64).copy()
    q_warm[:, :3] += 0.002 * rng.normal(size=(N, 3)) * \
        (np.arange(N) % 2 * 2 - 1)[:, None]
    # GT-derived stance schedule (without it the EOM demands 32 frames of
    # ballistic flight from a galloping cheetah and correctly destroys the
    # pose to get it)
    import json as _json
    import tempfile

    from cheetah_pose_estimation_tpu.models import skeleton as sk
    from cheetah_pose_estimation_tpu.pipeline import contacts as cmod
    dq_gt = np.zeros_like(q_gt)
    dq_gt[1:] = (q_gt[1:] - q_gt[:-1]) * fps
    com = np.asarray(sk.com_position(jnp.asarray(q_gt), subject))
    speed = float(np.mean(np.linalg.norm((com[1:] - com[:-1]) * fps,
                                         axis=1)))
    tmpd = tempfile.mkdtemp()
    cmod.contact_detection(q_gt, dq_gt, subject, 0, speed, fps,
                           data_dir=tmpd)
    with open(os.path.join(tmpd, "grf", "autogen-contact.json"),
              encoding="utf-8") as f:
        cj = _json.load(f)
    stance = kn.stance_matrix(cj["contacts"], cj["start_frame"], N)
    stance = kn.prune_stance(stance, q_gt, subject, 1.0 / fps)
    kd = kn.KineticData(base=data, stance=jnp.asarray(stance),
                        grf_fixed=jnp.zeros((N, 4)),
                        grf_xy_fixed=jnp.zeros((N, 4, 4)),
                        use_fixed_grf=jnp.asarray(0.0),
                        q_warm=jnp.asarray(q_warm))
    fte = kn.KineticFTE(kn.KineticConfig(fisheye=True, robust=True),
                        subject)
    e0, _, _ = fte._physics_costs(jnp.asarray(q_warm), kd)
    t0 = fte._kin.cost_terms(jnp.asarray(q_warm), data)
    st = fte.make_solver(stages=((3.0, 20), (1.0, 60)))(
        jnp.asarray(q_warm), kd)
    e1, _, _ = fte._physics_costs(st.q, kd)
    t1 = fte._kin.cost_terms(st.q, data)
    moved = float(jnp.max(jnp.abs(st.q - jnp.asarray(q_warm))))
    assert int(st.n_accepted) > 5, int(st.n_accepted)
    assert moved > 1e-3, moved                      # the r1 bug: ~no motion
    assert float(e1) < 0.35 * float(e0), (float(e0), float(e1))
    # measurement fidelity preserved (the const-acc "model" term is not in
    # the kinetic objective and legitimately changes); limits respected
    assert float(t1["measurement"]) < float(t0["measurement"]) + 2e3, \
        (float(t0["measurement"]), float(t1["measurement"]))
    assert float(t1["limit"]) < 1e4, float(t1["limit"])
    assert bool(jnp.isfinite(st.cost))
