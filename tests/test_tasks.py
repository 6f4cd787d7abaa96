"""Trajectory-generation tasks (reference cheetah.py:360-650 legacy family):
high-speed stop and periodic gallop as measurement-free optimal control."""
import numpy as np
import pytest

from cheetah_pose_estimation_tpu.dynamics import tasks
from cheetah_pose_estimation_tpu.models import params as P

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def subject():
    return P.get_subject("acinoset")


def test_high_speed_stop(subject):
    out = tasks.high_speed_stop(subject, initial_vel=8.0, n_frames=24,
                                h=0.02, max_iters=90, seed=0)
    assert np.all(np.isfinite(out["q"]))
    assert out["accepted"] > 5
    # starts at speed (toward -x per the skeleton convention)
    assert out["dq"][1, 0] == pytest.approx(-8.0, abs=0.5)
    # ends (close to) at rest
    assert out["final_speed"] < 1.0
    # travels forward while stopping, then stays put
    assert out["q"][-1, 0] < out["q"][0, 0]
    # physical consistency: the EOM slack is small in body-weight units
    assert out["eom_rms_bw"] < 0.5
    # feet on/above ground after the settle window
    from cheetah_pose_estimation_tpu.dynamics import eom as dyn
    import jax
    heights = np.asarray(jax.vmap(
        lambda q: dyn.foot_points(q, subject))(out["q"]))[..., 2]
    assert heights[12:].max() < 0.3
    # penalty-method contact: no gross penetration (a hard-bound solver
    # would pin this at >= 0; the corridor tightens with more iterations)
    assert heights.min() > -0.1


def test_high_speed_stop_min_distance_is_shorter(subject):
    base = tasks.high_speed_stop(subject, initial_vel=8.0, n_frames=24,
                                 h=0.02, max_iters=60, seed=0)
    mind = tasks.high_speed_stop(subject, initial_vel=8.0, n_frames=24,
                                 h=0.02, minimize_distance=True,
                                 max_iters=60, seed=0)
    assert np.all(np.isfinite(mind["q"]))
    # the distance objective should not lengthen the stop
    assert mind["stop_distance"] <= base["stop_distance"] + 0.1


def test_periodic_gallop(subject):
    order = ((1, 4), (3, 7), (14, 18), (11, 15))
    out = tasks.periodic_gallop(subject, avg_vel=9.0, foot_order=order,
                                n_frames=20, h=0.015, max_iters=60, seed=0)
    assert np.all(np.isfinite(out["q"]))
    assert out["accepted"] > 5
    # covers the requested stride at the requested average speed
    assert out["avg_speed"] == pytest.approx(9.0, rel=0.1)
    # periodic in everything but x
    assert out["periodicity_error"] < 0.15
    # physical consistency
    assert out["eom_rms_bw"] < 0.5
    # stance feet carry load at some point
    assert out["grf_z"].max() > 0.2
