"""Correlated DLC failure model + adaptive AR weights + stance pruning."""
import numpy as np

from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as P


def _trial(N=40, C=3, seed=0):
    rng = np.random.default_rng(seed)
    meas = rng.uniform(0, 2000, size=(N, C, 24, 2))
    lik = rng.uniform(0.6, 1.0, size=(N, C, 24))
    return meas, lik, rng


def test_corrupt_dlc_limb_confusion_swaps_pairs():
    meas, lik, rng = _trial(seed=1)
    out, lout = syn.corrupt_dlc(meas, lik, rng, confusion_rate=40.0)
    changed = np.any(out != meas, axis=(0, 1, 3)) if out.ndim == 4 else None
    # swapped cells must come in left/right pairs with full confidence
    diff = out != meas
    assert diff.any()
    frames, cams, markers = np.where(diff.any(axis=-1))
    limb = set(np.concatenate([a for a, b in syn._LIMB_SWAPS]
                              + [b for a, b in syn._LIMB_SWAPS]).tolist())
    assert set(markers.tolist()) <= limb
    assert (lout[frames, cams, markers] >= 0.8).all()


def test_corrupt_dlc_occlusion_freeze_is_confident_and_constant():
    meas, lik, rng = _trial(seed=2)
    out, lout = syn.corrupt_dlc(meas, lik, rng, occlusion_rate=60.0,
                                freeze_prob=1.0)
    diff = np.where((out != meas).any(axis=-1))
    assert len(diff[0]) > 0
    # frozen detections report high likelihood (confident-but-wrong)
    assert (lout[diff] >= 0.85).all()


def test_corrupt_dlc_occlusion_dropout_lowers_likelihood():
    meas, lik, rng = _trial(seed=3)
    out, lout = syn.corrupt_dlc(meas, lik, rng, occlusion_rate=60.0,
                                freeze_prob=0.0, lik_noise_px=0.0)
    assert (lout < lik).any()
    assert lout.min() < 0.5


def test_adaptive_weights_shrink_with_observed_error():
    from cheetah_pose_estimation_tpu.priors import armodel

    class FakeModel:
        error_variance = np.full(28, 0.01)

    y = np.zeros((30, 28))
    valid = np.ones(30)
    w_clean = armodel.adaptive_motion_weights(FakeModel(), y, y, valid)
    x_noisy = np.random.default_rng(0).normal(scale=0.5, size=(30, 28))
    w_noisy = armodel.adaptive_motion_weights(FakeModel(), y, x_noisy, valid)
    assert (w_clean > 0).all()
    np.testing.assert_allclose(w_clean, 1.0 / 0.01)
    assert (w_noisy < 0.1 * w_clean).all()   # shrunk where unreliable


def test_prune_stance_drops_fast_windows():
    from cheetah_pose_estimation_tpu.solver import kinetic as kn

    subject = P.get_subject("acinoset")
    N = 30
    # standing still -> slow feet; then translate fast -> fast feet
    q = np.zeros((N, 54))
    q[:, 2] = 0.5
    q[:, 5] = np.pi
    q[15:, 0] = 10.0 * (np.arange(15) + 1) / 120.0  # 10 m/s from frame 15
    stance = np.zeros((N, 4))
    stance[2:10, 0] = 1.0    # slow window: keep
    stance[18:28, 1] = 1.0   # 10 m/s window: drop
    out = kn.prune_stance(stance, q, subject, 1.0 / 120.0,
                          max_median_speed=4.0)
    assert out[2:10, 0].sum() == 8
    assert out[:, 1].sum() == 0
    # precomputed-speed fast path (used by the batched pipelines) agrees
    speeds = np.zeros((N, 4))
    speeds[18:28, :] = 10.0
    out2 = kn.prune_stance(stance, q, subject, 1.0 / 120.0,
                           max_median_speed=4.0, foot_speed=speeds)
    np.testing.assert_array_equal(out, out2)
