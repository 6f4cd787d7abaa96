"""Analytic monocular depth correction (pipeline/depth_anchor.py).

The correction must recover a known global shift along the camera viewing
ray — the error mode that dominates monocular MPE (reprojection-invisible,
stance-gap-visible with a 1/|ray_z| lever).
"""
import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk
from cheetah_pose_estimation_tpu.pipeline import contacts as cmod
from cheetah_pose_estimation_tpu.pipeline import depth_anchor as da

SUBJ = P.get_subject("acinoset")


def _gallop_with_camera(n_frames=32, seed=0):
    q = syn.gallop_trajectory(n_frames=n_frames, seed=seed)
    center = np.asarray(sk.fk_markers(q, SUBJ)).mean(axis=(0, 1))
    scene = syn.ring_cameras(center, n_cams=3, seed=seed)
    return q, scene


def test_camera_ray_points_from_centre_to_base():
    q, scene = _gallop_with_camera()
    ci = 1
    ray = da.camera_ray(q, scene.R[ci], scene.t[ci])
    c = -scene.R[ci].T @ scene.t[ci]
    np.testing.assert_allclose(np.linalg.norm(ray, axis=1), 1.0, atol=1e-9)
    # ray * distance lands back on the base
    d = np.linalg.norm(q[:, :3] - c, axis=1)
    np.testing.assert_allclose(c[None] + ray * d[:, None], q[:, :3],
                               atol=1e-9)


def test_ray_depth_correction_recovers_known_shift():
    """Shift the whole trajectory 0.8 m along the per-frame camera ray
    (reprojection-invisible); the correction must undo it to cm level."""
    from cheetah_pose_estimation_tpu.pipeline import bench_lib

    # a real reference trajectory carries detectable stance windows
    # (18-24 stance frames per trial); procedural gallops often do not
    q, _, fps = bench_lib.load_reference_trajectories(1)[0]
    center = np.asarray(sk.fk_markers(q, SUBJ)).mean(axis=(0, 1))
    scene = syn.ring_cameras(center, n_cams=3, seed=2, fps=fps)
    gz = cmod.estimate_ground_height(q, SUBJ)
    ci = 0
    ray = da.camera_ray(q, scene.R[ci], scene.t[ci])
    assert np.abs(ray[:, 2]).min() > 0.02, "scene has no depth lever"

    q_shift = q.copy()
    q_shift[:, :3] += 0.8 * ray
    stance = da.detect_stance(q, SUBJ, fps, gz)
    if stance.sum() == 0:
        pytest.skip("no stance detected on this trajectory")
    q_corr, _, shift = da.ray_depth_correction(
        q_shift, SUBJ, 120.0, gz, scene.R[ci], scene.t[ci], stance=stance)
    # differential claim: relative to the correction the procedure applies
    # to the UNSHIFTED trajectory (its baseline stance-gap bias, ~0.1 m on
    # real data), the fitted shift must recover the added 0.8 m
    _, _, shift0 = da.ray_depth_correction(
        q, SUBJ, 120.0, gz, scene.R[ci], scene.t[ci], stance=stance)
    assert abs(np.mean(shift - shift0) + 0.8) < 0.05, \
        (np.mean(shift), np.mean(shift0))
    err_before = np.linalg.norm(q_shift[:, :3] - q[:, :3], axis=1).mean()
    err_after = np.linalg.norm(q_corr[:, :3] - q[:, :3], axis=1).mean()
    assert err_after < 0.2 * err_before, (err_before, err_after)


def test_no_stance_evidence_is_a_noop():
    q, scene = _gallop_with_camera(seed=3)
    stance = np.zeros((q.shape[0], 4))
    q_corr, _, shift = da.ray_depth_correction(
        q, SUBJ, 120.0, 0.0, scene.R[0], scene.t[0], stance=stance)
    np.testing.assert_array_equal(q_corr, q)
    np.testing.assert_array_equal(shift, 0.0)


def test_fit_shift_is_robust_min_of_window_samples():
    """fit_shift is the lowest implied shift across windows: hovering
    windows (inflated gaps) must not inflate it, and a single penetration
    artifact (grossly low sample) must fall back to the second lowest."""
    N = 60
    ray_z = np.full(N, -0.15)
    ts = np.array([5.0, 15.0, 25.0, 35.0, 45.0, 55.0])
    ws = np.full(len(ts), 8.0)
    true_s = 0.5                            # constant global depth error
    gaps = np.full(len(ts), true_s * 0.15)
    # three windows hover (feet never reached the plane): inflated gaps
    gaps_hover = gaps.copy()
    gaps_hover[[1, 3, 4]] += np.array([0.03, 0.07, 0.05])
    s = da.fit_shift(ts, gaps_hover, ws, ray_z)
    np.testing.assert_allclose(s, true_s, atol=1e-9)
    # one penetration artifact 0.6 m below the rest: second-lowest wins
    gaps_pen = gaps_hover.copy()
    gaps_pen[2] -= 0.6 * 0.15
    s = da.fit_shift(ts, gaps_pen, ws, ray_z)
    np.testing.assert_allclose(s, true_s, atol=1e-9)
    # a mild low sample (within 0.5 m of the next) is trusted
    gaps_mild = gaps_hover.copy()
    gaps_mild[2] -= 0.1 * 0.15
    s = da.fit_shift(ts, gaps_mild, ws, ray_z)
    np.testing.assert_allclose(s, true_s - 0.1, atol=1e-9)
    # corrections below the channel's noise floor (min_shift_m) are
    # suppressed: cm-level paw noise times the ray lever produces this
    # much spurious shift, so it is not evidence
    gaps_small = np.full(len(ts), 0.2 * 0.15)
    s = da.fit_shift(ts, gaps_small, ws, ray_z)
    np.testing.assert_array_equal(s, 0.0)


def test_touchdown_samples_pick_window_minima():
    """Each consecutive stance run contributes exactly one sample at its
    minimum-gap frame, weighted by run length."""
    q = syn.gallop_trajectory(n_frames=20, seed=1)
    stance = np.zeros((20, 4))
    stance[3:9, 0] = 1.0     # one 6-frame window, foot 0
    stance[12:15, 2] = 1.0   # one 3-frame window, foot 2
    ts, gaps, ws = da.touchdown_samples(q, SUBJ, stance, 0.0)
    assert len(ts) == 2
    paws = da.paw_heights(q, SUBJ)
    assert gaps[0] == pytest.approx(paws[3:9, 0].min())
    assert gaps[1] == pytest.approx(paws[12:15, 2].min())
    np.testing.assert_array_equal(ws, [6.0, 3.0])


def test_fit_shift_ignores_shallow_penetration_noise():
    """Shallow negative gaps are pose noise, not depth evidence: the ray
    lever (~7x) otherwise amplifies centimetres of paw error into a large
    toward-camera shift (round-4 measured: samples -0.01..-0.08 m chose
    -0.74 m and took a flick trial from 186 to 637 mm MPE)."""
    N = 60
    ray_z = np.full(N, -0.11)
    ts = np.array([5.0, 20.0, 35.0, 50.0])
    ws = np.full(4, 4.0)
    # the flick1 failure pattern: all-shallow-negative samples
    gaps = np.array([-0.017, -0.009, -0.051, -0.083])
    np.testing.assert_array_equal(
        da.fit_shift(ts, gaps, ws, ray_z), 0.0)
    # mixed evidence (hover + shallow penetration): plane already touched,
    # only the positive samples count -> their minimum
    gaps_mixed = np.array([-0.024, 0.004, -0.011, 0.03])
    s = da.fit_shift(ts, gaps_mixed, ws, ray_z)
    np.testing.assert_array_equal(s, 0.0)   # below the noise floor
    # unanimous deep penetration IS depth evidence: least-deep sample,
    # mirrored at-least-one-touches logic
    gaps_deep = np.array([-0.09, -0.12, -0.10, -0.113])
    s = da.fit_shift(ts, gaps_deep, ws, ray_z)
    np.testing.assert_allclose(s, -0.12 / 0.11, rtol=1e-9)


def test_scale_depth_shift_sees_global_depth_error():
    """With measurements synthesized at the TRUE pose, a trajectory pushed
    along the ray reprojects at the wrong apparent scale; the body-scale
    channel must estimate a shift of the right sign and rough magnitude
    (it reads pure depth error exactly — attenuation only appears when a
    solver has re-adapted the pose, see scale_shift_sign)."""
    from cheetah_pose_estimation_tpu.pipeline import bench_lib

    q, _, fps = bench_lib.load_reference_trajectories(1)[0]
    q = q[:32]
    center = np.asarray(sk.fk_markers(q, SUBJ)).mean(axis=(0, 1))
    scene = syn.ring_cameras(center, n_cams=3, seed=4, fps=fps)
    trial = syn.synthesize(q, SUBJ, scene, noise_px=1.0, outlier_frac=0.0,
                           seed=4, subject_name="acinoset")
    w = syn.gated_weights(trial)
    ci = 0
    ray = da.camera_ray(q, scene.R[ci], scene.t[ci])
    for true_shift in (-0.3, 0.25):
        q_bad = q.copy()
        q_bad[:, :3] += true_shift * ray
        est = da.scale_depth_shift(
            q_bad, SUBJ, trial.meas[:, ci], w[:, ci], scene.K[ci],
            scene.D[ci], scene.R[ci], scene.t[ci])
        # the correction is -true_shift (move back toward truth)
        assert est * (-true_shift) > 0, (true_shift, est)
        assert abs(est - (-true_shift)) < 0.6 * abs(true_shift), \
            (true_shift, est)
        sign = da.scale_shift_sign(
            q_bad, SUBJ, trial.meas[:, ci], w[:, ci], scene.K[ci],
            scene.D[ci], scene.R[ci], scene.t[ci])
        assert sign == -np.sign(true_shift)
    # at the true depth the channel abstains or reads near zero
    est0 = da.scale_depth_shift(
        q, SUBJ, trial.meas[:, ci], w[:, ci], scene.K[ci],
        scene.D[ci], scene.R[ci], scene.t[ci])
    assert abs(est0) < 0.1, est0


@pytest.mark.slow
def test_depth_linescan_recovers_shift_and_keeps_clean_input():
    """The line-scan must (a) pick the candidate that undoes a known
    depth error when the evidence is clear, and (b) ship the INPUT
    trajectory unchanged when the zero lane wins (the zero lane's
    re-solve must never replace the input)."""
    import jax.numpy as jnp

    from cheetah_pose_estimation_tpu.pipeline import bench_lib
    from cheetah_pose_estimation_tpu.parallel import batch as pbatch
    from cheetah_pose_estimation_tpu.solver import kinematic as kin

    q, _, fps = bench_lib.load_reference_trajectories(1)[0]
    d, q0, trial = bench_lib.build_monocular_problem(
        q, "acinoset", fps, seed=0, noise_px=1.0)
    batched, q0b = pbatch.pad_and_stack([d], [q0], n_frames=32,
                                        dtype=jnp.float32)
    n = min(q.shape[0], 32)
    # ground truth at the true depth, pushed 0.2 m along the ray
    cam_R, cam_t = np.asarray(d.cam.R[0]), np.asarray(d.cam.t[0])
    ray = da.camera_ray(trial.q_gt[:n], cam_R, cam_t)
    q_in = np.zeros((1, 32, 54))
    q_in[0, :n] = trial.q_gt[:n]
    q_in[0, :n, :3] += 0.2 * ray
    rays = np.zeros((1, 32, 3))
    rays[0, :n] = ray
    scan = da.make_depth_linescan(SUBJ, jnp.float32,
                                  shifts=(-0.3, -0.2, -0.1, 0.0, 0.1),
                                  stages=((1.0, 30),))
    q_out, shift = scan(jnp.asarray(q_in, jnp.float32), batched, rays)
    assert shift[0] == -0.2, shift
    err = np.linalg.norm(
        np.asarray(q_out[0, :n, :3], np.float64) - trial.q_gt[:n, :3],
        axis=1).mean()
    assert err < 0.08, err
    # clean input: zero lane must win AND the input must ship unchanged
    q_clean = np.zeros((1, 32, 54))
    q_clean[0, :n] = trial.q_gt[:n]
    q_out2, shift2 = scan(jnp.asarray(q_clean, jnp.float32), batched, rays)
    assert shift2[0] == 0.0, shift2
    np.testing.assert_array_equal(np.asarray(q_out2),
                                  np.asarray(q_clean, np.float32))
    # veto: a contradictory scale-channel median blocks the pick
    q_out3, shift3 = scan(jnp.asarray(q_in, jnp.float32), batched, rays,
                          scale_med=np.array([+1.0]))
    assert shift3[0] == 0.0
    np.testing.assert_array_equal(np.asarray(q_out3),
                                  np.asarray(q_in, np.float32))
