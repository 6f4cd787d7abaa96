"""Static GRF estimation: physical correctness on constructed cases."""
import jax
import jax.numpy as jnp
import numpy as np

from cheetah_pose_estimation_tpu.dynamics import eom as dyn
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.solver.static_grf import estimate_static_grf

SUBJ = P.get_subject("acinoset")


def test_static_stand_supports_weight():
    """A stationary pose with all four feet in stance: the solved vertical
    GRFs must carry the body weight (sum GRFz ~ 1 body weight)."""
    q = np.zeros((3, 54))
    q[:, 2] = 0.6
    q[:, 5] = np.pi
    for i in range(1, 17):
        q[:, 3 * i + 5] = np.pi
    dq = np.zeros_like(q)
    ddq = np.zeros_like(q)
    stance = np.ones((3, 4))
    gz, gxy = estimate_static_grf(jnp.asarray(q), jnp.asarray(dq),
                                  jnp.asarray(ddq), jnp.asarray(stance),
                                  SUBJ)
    gz = np.asarray(gz)
    np.testing.assert_allclose(gz.sum(axis=1), 1.0, atol=0.05)
    assert (gz >= 0).all()
    # friction cone satisfied
    gxy = np.asarray(gxy)
    assert np.all(gxy.sum(axis=2) <= 1.3 * gz + 1e-6)


def test_flight_phase_zero_grf():
    q = np.zeros((2, 54))
    q[:, 2] = 1.0
    q[:, 5] = np.pi
    dq = np.zeros_like(q)
    ddq = np.zeros_like(q)
    stance = np.zeros((2, 4))
    gz, gxy = estimate_static_grf(jnp.asarray(q), jnp.asarray(dq),
                                  jnp.asarray(ddq), jnp.asarray(stance),
                                  SUBJ)
    np.testing.assert_allclose(np.asarray(gz), 0.0)
    np.testing.assert_allclose(np.asarray(gxy), 0.0)


def test_grf_reduces_base_eom_residual():
    rng = np.random.default_rng(0)
    q = rng.normal(scale=0.2, size=(4, 54))
    q[:, 2] += 0.5
    dq = rng.normal(scale=0.5, size=(4, 54))
    ddq = rng.normal(scale=1.0, size=(4, 54))
    stance = np.ones((4, 4))
    gz, gxy = estimate_static_grf(jnp.asarray(q), jnp.asarray(dq),
                                  jnp.asarray(ddq), jnp.asarray(stance),
                                  SUBJ)
    scale = SUBJ.total_mass * dyn.GRAVITY
    for t in range(4):
        res0 = np.asarray(dyn.eom_residual(
            jnp.asarray(q[t]), jnp.asarray(dq[t]), jnp.asarray(ddq[t]),
            jnp.zeros(4), jnp.zeros((4, 4)), SUBJ))[:6] / scale
        res1 = np.asarray(dyn.eom_residual(
            jnp.asarray(q[t]), jnp.asarray(dq[t]), jnp.asarray(ddq[t]),
            gz[t], gxy[t], SUBJ))[:6] / scale
        assert np.linalg.norm(res1) <= np.linalg.norm(res0) + 1e-9
