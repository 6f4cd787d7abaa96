"""Kinematic FTE solver: gradient exactness and synthetic end-to-end recovery."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import noise as noise_tables
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk
from cheetah_pose_estimation_tpu.ops import banded
from cheetah_pose_estimation_tpu.solver import gn
from cheetah_pose_estimation_tpu.solver import kinematic as kin

pytestmark = pytest.mark.slow

REF_PICKLE = ("/root/reference/data/test_set/2019_03_07/phantom/run/"
              "fte_kinematic/fte.pickle")


def _make_data(trial: syn.SyntheticTrial, use_gmm=False, use_ar=False,
               n_gmm=3, seed=0) -> kin.KinematicData:
    rng = np.random.default_rng(seed)
    N = trial.q_gt.shape[0]
    w = syn.gated_weights(trial)
    if use_gmm:
        means = rng.normal(scale=0.3, size=(n_gmm, 22))
        A = rng.normal(size=(n_gmm, 22, 22)) * 0.1
        prec = np.einsum("kij,klj->kil", A, A) + np.eye(22)[None] * 2.0
        log_norm = rng.normal(size=(n_gmm,))
        gmm = kin.GMMPrior(jnp.asarray(means), jnp.asarray(prec),
                           jnp.asarray(log_norm))
    else:
        gmm = kin.GMMPrior(jnp.zeros((1, 22)), jnp.eye(22)[None],
                           jnp.zeros((1,)))
    if use_ar:
        ar = kin.ARAnchor(jnp.asarray(rng.normal(scale=0.2, size=(N, 28))),
                          jnp.asarray(rng.uniform(0.5, 2.0, size=28)),
                          jnp.asarray((np.arange(N) >= 4).astype(float)))
    else:
        ar = kin.ARAnchor(jnp.zeros((N, 28)), jnp.zeros(28), jnp.zeros(N))
    return kin.KinematicData(
        meas=jnp.asarray(trial.meas),
        weight=jnp.asarray(w),
        cam=kin.CameraSet(jnp.asarray(trial.scene.K),
                          jnp.asarray(trial.scene.D),
                          jnp.asarray(trial.scene.R),
                          jnp.asarray(trial.scene.t)),
        h=jnp.asarray(1.0 / trial.scene.fps),
        acc_weight=jnp.asarray(noise_tables.acc_model_weights()),
        frame_valid=jnp.ones(N),
        gmm=gmm, ar=ar)


def _small_trial(n=8, n_cams=2, seed=0):
    subject = P.get_subject("acinoset")
    q = syn.gallop_trajectory(n_frames=n, seed=seed)
    center = np.asarray(sk.fk_markers(q, subject)).mean(axis=(0, 1))
    scene = syn.ring_cameras(center, n_cams=n_cams, seed=seed)
    return syn.synthesize(q, subject, scene, seed=seed), subject


def test_normal_gradient_matches_autodiff():
    trial, subject = _small_trial()
    cfg = kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True,
                              use_ar=True)
    fte = kin.KinematicFTE(cfg, subject)
    data = _make_data(trial, use_gmm=True, use_ar=True)
    rng = np.random.default_rng(1)
    q = jnp.asarray(trial.q_gt + rng.normal(scale=0.1,
                                            size=trial.q_gt.shape))
    g, H = fte.normal(q, data)
    g_ref = jax.grad(lambda qq: fte._cost(qq, data))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-8)


def test_acc_banded_matches_autodiff_hessian():
    N, d = 7, 54
    h = jnp.asarray(0.01)
    w = jnp.asarray(noise_tables.acc_model_weights())
    fv = jnp.ones(N)
    H = kin.acc_banded(h, w, fv)
    flat_cost = lambda qf: kin.acc_cost(qf.reshape(N, d), h, w, fv)
    Hd_ref = jax.hessian(flat_cost)(jnp.zeros(N * d))
    np.testing.assert_allclose(np.asarray(banded.to_dense(H)),
                               np.asarray(Hd_ref), rtol=1e-8, atol=1e-6)
    # gradient consistency at random q
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, d)))
    g = banded.matvec(H, q)
    g_ref = jax.grad(lambda qq: kin.acc_cost(qq, h, w, fv))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-8)


def test_end_to_end_multiview_recovery():
    if not os.path.exists(REF_PICKLE):
        pytest.skip("reference pickle unavailable")
    from cheetah_pose_estimation_tpu.pipeline import initialization as init
    with open(REF_PICKLE, "rb") as f:
        q_gt = pickle.load(f)["q"]
    subject = P.get_subject("phantom")
    markers = np.asarray(sk.fk_markers(q_gt, subject))
    scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=6, seed=3)
    trial = syn.synthesize(q_gt, subject, scene, noise_px=1.5,
                           outlier_frac=0.02, seed=3,
                           subject_name="phantom")
    cfg = kin.KinematicConfig(fisheye=True, robust=True)
    fte = kin.KinematicFTE(cfg, subject)
    data = _make_data(trial)
    q0 = jnp.asarray(init.initialize_trajectory(
        trial.meas, syn.gated_weights(trial), scene.K, scene.D, scene.R,
        scene.t, subject, fisheye=True))
    run = fte.make_solver()
    state = run(q0, data)
    q_est = np.asarray(state.q)
    rec = np.asarray(sk.fk_markers(q_est, subject))
    mpjpe_mm = np.mean(np.linalg.norm(rec - trial.markers_gt, axis=2)) * 1000
    assert float(state.cost) < float(fte.cost(q0, data))
    # with 6 cameras and 1.5 px noise the reconstruction should be mm-level
    assert mpjpe_mm < 12.0, f"MPJPE {mpjpe_mm:.1f} mm"
    # solver should reach at least the cost of the ground-truth configuration
    # (GT is not the optimum of the noisy objective, so this is achievable)
    assert float(state.cost) <= float(fte.cost(jnp.asarray(q_gt), data))


def test_cr_linear_solver_equivalent():
    """The cyclic-reduction linear solver yields the same reconstruction as
    the sequential scan (same LM path up to roundoff)."""
    if not os.path.exists(REF_PICKLE):
        pytest.skip("reference pickle unavailable")
    from cheetah_pose_estimation_tpu.pipeline import initialization as init
    with open(REF_PICKLE, "rb") as f:
        q_gt = pickle.load(f)["q"][:24]
    subject = P.get_subject("phantom")
    markers = np.asarray(sk.fk_markers(q_gt, subject))
    scene = syn.ring_cameras(markers.mean(axis=(0, 1)), n_cams=4, seed=5)
    trial = syn.synthesize(q_gt, subject, scene, noise_px=1.5, seed=5,
                           subject_name="phantom")
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    data = _make_data(trial)
    q0 = jnp.asarray(init.initialize_trajectory(
        trial.meas, syn.gated_weights(trial), scene.K, scene.D, scene.R,
        scene.t, subject, fisheye=True))
    stages = ((3.0, 10), (1.0, 30))
    st_scan = fte.make_solver(stages=stages, linear_solver="scan")(q0, data)
    st_cr = fte.make_solver(stages=stages, linear_solver="cr")(q0, data)
    # identical accept/reject path in f64 => same iterate to tight tolerance
    np.testing.assert_allclose(np.asarray(st_cr.q), np.asarray(st_scan.q),
                               atol=1e-6)
    assert abs(float(st_cr.cost) - float(st_scan.cost)) \
        <= 1e-8 * max(1.0, float(st_scan.cost))


def test_live_shutter_gradient_matches_autodiff():
    """With live shutter coupling the measurement term depends on q[t-2..t]
    through the shift; the analytic chain-rule gradient must match autodiff
    of the cost exactly."""
    trial, subject = _small_trial(n=9, n_cams=3, seed=2)
    cfg = kin.KinematicConfig(fisheye=True, robust=True, live_shutter=True)
    fte = kin.KinematicFTE(cfg, subject)
    data = _make_data(trial)
    h = float(data.h)
    data = data._replace(sd_tau=jnp.asarray([0.0, 0.4 * h, -0.7 * h]))
    rng = np.random.default_rng(3)
    q = jnp.asarray(trial.q_gt + rng.normal(scale=0.05,
                                            size=trial.q_gt.shape))
    g, _ = fte.normal(q, data)
    g_ref = jax.grad(lambda qq: fte._cost(qq, data))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-8)


def test_live_shutter_solve_accounts_for_delay():
    """A camera observing tau seconds late biases the lagged solver; the
    live-coupled solve with the true tau must beat the tau=0 solve."""
    from cheetah_pose_estimation_tpu.ops import camera as cam_ops
    subject = P.get_subject("acinoset")
    q_gt = syn.gallop_trajectory(n_frames=20, seed=4)
    center = np.asarray(sk.fk_markers(q_gt, subject)).mean(axis=(0, 1))
    scene = syn.ring_cameras(center, n_cams=3, seed=4)
    trial = syn.synthesize(q_gt, subject, scene, noise_px=0.5, seed=4)
    h = 1.0 / scene.fps
    tau_true = np.array([0.0, 0.5 * h, -0.5 * h])
    # re-render cameras 1,2 with a genuine sub-frame delay: project the
    # pose advanced along its base velocity/acceleration
    qb = np.asarray(q_gt[:, :3])
    vel = np.zeros_like(qb); vel[1:] = (qb[1:] - qb[:-1]) / h
    acc = np.zeros_like(qb); acc[2:] = (vel[2:] - vel[1:-1]) / h
    meas = np.asarray(trial.meas)
    for c in (1, 2):
        shift = vel * tau_true[c] + acc * tau_true[c] ** 2
        for t in range(q_gt.shape[0]):
            pts = np.asarray(sk.fk_markers_linear(jnp.asarray(q_gt[t]),
                                                  subject)) + shift[t]
            uv = np.asarray(cam_ops.project_fisheye(
                jnp.asarray(pts), jnp.asarray(scene.K[c]),
                jnp.asarray(scene.D[c]), jnp.asarray(scene.R[c]),
                jnp.asarray(scene.t[c])))
            meas[t, c, :, :, 0] = uv + np.asarray(
                np.random.default_rng(t * 10 + c).normal(0, 0.5,
                                                         uv.shape))
    trial = trial._replace(meas=jnp.asarray(meas))
    data = _make_data(trial)
    q0 = jnp.asarray(q_gt + np.random.default_rng(5).normal(
        0, 0.03, q_gt.shape))
    stages = ((3.0, 10), (1.0, 40))

    fte0 = kin.KinematicFTE(kin.KinematicConfig(), subject)
    st0 = fte0.make_solver(stages=stages)(q0, data)

    fte1 = kin.KinematicFTE(kin.KinematicConfig(live_shutter=True), subject)
    d1 = data._replace(sd_tau=jnp.asarray(tau_true))
    st1 = fte1.make_solver(stages=stages)(q0, d1)

    def mpe(qs):
        rec = np.asarray(sk.fk_markers(np.asarray(qs), subject))
        return np.mean(np.linalg.norm(rec - trial.markers_gt, axis=2))

    assert mpe(st1.q) < mpe(st0.q) * 0.9, (mpe(st1.q), mpe(st0.q))


def test_scan_driver_equivalent():
    """The fixed-length scan GNC driver reaches the same solution as the
    while-loop driver when lanes use their full budgets."""
    trial, subject = _small_trial(n=10, n_cams=3, seed=11)
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    data = _make_data(trial)
    rng = np.random.default_rng(11)
    q0 = jnp.asarray(trial.q_gt + rng.normal(scale=0.05,
                                             size=trial.q_gt.shape))
    stages = ((3.0, 8), (1.0, 20))
    st_while = fte.make_solver(stages=stages, ftol=0.0)(q0, data)
    st_scan = fte.make_solver(stages=stages, ftol=0.0,
                              driver="scan")(q0, data)
    np.testing.assert_allclose(np.asarray(st_scan.q),
                               np.asarray(st_while.q), atol=1e-8)
    assert int(st_scan.it) == int(st_while.it) == 28


def test_heading_unwrap_no_branch_flips():
    """A heading near 0 (mod 2pi) must not produce 2pi psi jumps between
    frames (the atan2 branch cut): trial 2017_09_02/bottom/jules/run2 runs
    at yaw ~ 0 and the wrapped init injected ~2pi*fps of fake yaw rate,
    collapsing the multi-view solve into a wound-up local minimum
    (round-2 regression: MPJPE 510 mm from init vs 22 mm from GT)."""
    from cheetah_pose_estimation_tpu.pipeline import initialization as init
    N = 40
    x = 4.0 + 0.1 * np.arange(N)
    y = 1e-4 * np.sin(np.arange(N))      # heading oscillates about -x axis
    spine = np.stack([x, y, 0.6 * np.ones(N)], axis=1)
    sm, psi = init.smooth_and_head(spine)
    assert np.abs(np.diff(psi)).max() < 1.0, psi
    # principal branch: the unwrapped heading stays near 0, not 2pi
    assert np.abs(np.median(psi)) < np.pi + 0.5


def test_base_anchor_gradient_matches_autodiff():
    """Base-pose anchor term (KinematicData.base_ref +
    config.base_anchor_*): exact quadratic — gradient and curvature must
    match autodiff, and the term must vanish when the weights are zero."""
    trial, subject = _small_trial()
    rng = np.random.default_rng(3)
    data = _make_data(trial, use_gmm=True)
    N = trial.q_gt.shape[0]
    base_ref = jnp.asarray(trial.q_gt[:, :6]
                           + rng.normal(scale=0.05, size=(N, 6)))
    data = data._replace(base_ref=base_ref)
    cfg = kin.KinematicConfig(fisheye=True, robust=True, use_gmm=True,
                              base_anchor_trans=4e2, base_anchor_rot=1e2)
    fte = kin.KinematicFTE(cfg, subject)
    q = jnp.asarray(trial.q_gt + rng.normal(scale=0.1,
                                            size=trial.q_gt.shape))
    g, H = fte.normal(q, data)
    g_ref = jax.grad(lambda qq: fte._cost(qq, data))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-8)
    # zero-weight config must equal the anchor-free cost exactly
    fte0 = kin.KinematicFTE(kin.KinematicConfig(
        fisheye=True, robust=True, use_gmm=True), subject)
    np.testing.assert_allclose(float(fte0._cost(q, data)),
                               float(fte._cost(q, data))
                               - float(jnp.sum(
                                   jnp.asarray([4e2] * 3 + [1e2] * 3)
                                   * (q[:, :6] - base_ref) ** 2)),
                               rtol=1e-6)


def test_base_anchor_pins_base_not_pose():
    """With a strong base anchor, a solve from a perturbed init must land
    near the base_ref trajectory in its base DOF while the joints remain
    free to fit the measurements."""
    trial, subject = _small_trial(n=8, n_cams=2)
    data = _make_data(trial)
    base_ref = jnp.asarray(trial.q_gt[:, :6])
    data = data._replace(base_ref=base_ref)
    cfg = kin.KinematicConfig(fisheye=True, robust=True,
                              base_anchor_trans=1e6, base_anchor_rot=1e6)
    fte = kin.KinematicFTE(cfg, subject)
    rng = np.random.default_rng(5)
    q0 = jnp.asarray(trial.q_gt + rng.normal(
        scale=0.05, size=trial.q_gt.shape))
    st = fte.make_solver(stages=((1.0, 40),))(q0, data)
    base_err = np.abs(np.asarray(st.q[:, :3])
                      - trial.q_gt[:, :3]).max()
    q0_err = np.abs(np.asarray(q0[:, :3]) - trial.q_gt[:, :3]).max()
    assert base_err < 0.02 and base_err < 0.25 * q0_err, \
        (base_err, q0_err)
