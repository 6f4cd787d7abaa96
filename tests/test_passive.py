"""Passive force elements (drag, torque spring, torque damper) — the
physical_education element family imported at reference cheetah.py:13-15."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheetah_pose_estimation_tpu.dynamics import passive
from cheetah_pose_estimation_tpu.models import params as P


@pytest.fixture(scope="module")
def subject():
    return P.get_subject("acinoset")


def _rand_state(seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=54) * 0.3
    q[2] += 0.6
    dq = rng.normal(size=54)
    return jnp.asarray(q), jnp.asarray(dq)


def test_drag_dissipates(subject):
    q, dq = _rand_state(1)
    c = passive.cylinder_drag_coefficients(subject)
    assert c.shape == (17,) and (c > 0).all()
    Q = passive.drag_generalized_forces(q, dq, subject, c)
    # drag never does positive work
    assert float(Q @ dq) < 0.0
    # and scales quadratically with speed
    Q2 = passive.drag_generalized_forces(q, 2.0 * dq, subject, c)
    np.testing.assert_allclose(float(Q2 @ (2 * dq)),
                               8.0 * float(Q @ dq), rtol=1e-6)


def test_spring_is_conservative(subject):
    q, _ = _rand_state(2)
    spring = passive.make_torque_spring(
        [("base", "tail0", "y"), ("tail0", "tail1", "y")],
        stiffness=3.0, rest=0.1)
    Q = passive.spring_generalized_forces(q, spring)
    Q_ad = -jax.grad(lambda qq: passive.spring_potential(qq, spring))(q)
    np.testing.assert_allclose(np.asarray(Q), np.asarray(Q_ad), atol=1e-12)
    # at rest angle the spring is silent
    g = passive.joint_coefficient_row("base", "tail0", "y")
    q0 = np.asarray(q)
    # drive both relative coordinates to the rest angle
    q_rest = q0.copy()
    q_rest[np.nonzero(g)[0][1]] = q_rest[np.nonzero(g)[0][0]] + 0.1
    g2 = passive.joint_coefficient_row("tail0", "tail1", "y")
    q_rest[np.nonzero(g2)[0][1]] = q_rest[np.nonzero(g2)[0][0]] + 0.1
    Q0 = passive.spring_generalized_forces(jnp.asarray(q_rest), spring)
    np.testing.assert_allclose(np.asarray(Q0), 0.0, atol=1e-12)


def test_damper_dissipates(subject):
    _, dq = _rand_state(3)
    damper = passive.make_torque_damper(
        [("base", "bodyF", "y"), ("bodyF", "neck", "y")], damping=0.5)
    Q = passive.damper_generalized_forces(dq, damper)
    assert float(Q @ dq) <= 0.0
    # zero relative rate -> zero force
    Q0 = passive.damper_generalized_forces(jnp.zeros(54), damper)
    np.testing.assert_allclose(np.asarray(Q0), 0.0, atol=1e-12)


def test_simulate_with_passive_elements(subject):
    """A damped tail spring pulls the tail toward its rest angle during a
    short passive drop."""
    from cheetah_pose_estimation_tpu.dynamics import simulate as sim

    q0 = sim.drop_pose(subject, height=0.9)
    g = passive.joint_coefficient_row("base", "tail0", "y")
    idx = np.nonzero(g)[0]
    q0 = np.asarray(q0)
    q0[idx[1]] = q0[idx[0]] + 0.8        # tail kinked 0.8 rad off rest
    spring = passive.make_torque_spring([("base", "tail0", "y")],
                                        stiffness=200.0, rest=0.0)
    damper = passive.make_torque_damper([("base", "tail0", "y")],
                                        damping=20.0)
    ext = passive.make_ext_q_fn(subject, spring=spring, damper=damper)
    qs, _ = sim.simulate(subject, q0, np.zeros(54), duration=0.12,
                         dt=2e-4, ext_q_fn=ext, record_every=100)
    rel = qs @ g
    assert np.all(np.isfinite(qs))
    # the kink decays toward the rest angle
    assert abs(rel[-1]) < abs(rel[0]) * 0.8
