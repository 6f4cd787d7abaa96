"""Forward-dynamics simulation: ballistic phase, contact support, drop test."""
import numpy as np
import pytest

from cheetah_pose_estimation_tpu.dynamics import eom as dyn
from cheetah_pose_estimation_tpu.dynamics import simulate as sim
from cheetah_pose_estimation_tpu.models import params as P

pytestmark = pytest.mark.slow

SUBJ = P.get_subject("acinoset")


def test_ballistic_com_follows_gravity():
    """Above the ground, the centre of mass must free-fall exactly."""
    from cheetah_pose_estimation_tpu.models import skeleton as sk
    q0 = sim.drop_pose(SUBJ, height=3.0)
    dq0 = np.zeros(54)
    dq0[0] = 4.0  # forward throw
    T = 0.2
    q, dq = sim.simulate(SUBJ, q0, dq0, T, dt=5e-4, record_every=40)
    com0 = np.asarray(sk.com_position(q[0], SUBJ))
    com1 = np.asarray(sk.com_position(q[-1], SUBJ))
    n_rec = q.shape[0] - 1
    t = n_rec * 40 * 5e-4
    expect = com0 + np.array([4.0 * t, 0.0, -0.5 * dyn.GRAVITY * t**2])
    np.testing.assert_allclose(com1, expect, atol=2e-3)


def test_drop_test_lands_upright():
    out = sim.drop_test(SUBJ, initial_height=0.8, duration=0.6)
    assert np.isfinite(out["q"]).all()
    # landed: feet near the ground, base above the reference's 0.2 m bound
    assert out["final_base_height"] > 0.2, out["final_base_height"]
    assert out["final_base_height"] < 0.8
    assert out["final_foot_heights"].min() < 0.1


def test_contact_supports_standing():
    """Starting with feet at the ground, the model must not fall through."""
    q0 = sim.drop_pose(SUBJ, height=0.0)
    # place base so feet touch z=0
    from cheetah_pose_estimation_tpu.dynamics.eom import foot_points
    import jax.numpy as jnp
    h = np.asarray(foot_points(jnp.asarray(q0), SUBJ))[:, 2].min()
    q0[2] -= h
    out = sim.drop_test(SUBJ, initial_height=q0[2], duration=0.4)
    assert out["q"][:, 2].min() > 0.1
