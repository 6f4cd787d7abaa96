"""Mesh-sharded batched solve must match the single-device solve.

The 1-D trial mesh is pure data parallelism (SURVEY §2.13): each trial's
block-banded system is device-local, so sharding must be a layout decision
only — identical numerics to running the same vmapped solve on one device.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as params_mod
from cheetah_pose_estimation_tpu.parallel import batch as pbatch
from cheetah_pose_estimation_tpu.pipeline import bench_lib
from cheetah_pose_estimation_tpu.solver import kinematic as kin
from cheetah_pose_estimation_tpu.solver import kinetic as kn

pytestmark = pytest.mark.slow

N_DEV = 8


@pytest.fixture(scope="module")
def problems():
    datas, q0s = [], []
    for i in range(N_DEV):
        q_gt = syn.gallop_trajectory(n_frames=20 + (i % 3), seed=i)
        d, q0, _ = bench_lib.build_monocular_problem(
            q_gt, "acinoset", 120.0, seed=i, n_cams=2, cam_idx=1)
        datas.append(d)
        q0s.append(q0)
    return pbatch.pad_and_stack(datas, q0s, n_frames=24, dtype=jnp.float32)


def test_kinematic_sharded_equals_single(problems):
    """Sharded and single-device layouts must agree on one evaluation and
    one damped step. A FULL LM solve is not layout-reproducible in f32:
    XLA compiles different fusions per layout, the ~1e-7-relative cost
    differences flip accept/reject branches, and the paths diverge — so
    the meaningful invariant is the per-iteration computation."""
    assert len(jax.devices()) >= N_DEV
    batched, q0b = problems
    subject = params_mod.get_subject("acinoset")
    from cheetah_pose_estimation_tpu.solver import gn as gn_mod
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)

    @jax.jit
    @jax.vmap
    def one_step(q0, data):
        c = fte._cost(q0, data, 1.0)
        g, H = fte._normal(q0, data, 1.0)
        dq = gn_mod._scaled_solve(g, H, jnp.asarray(1.0, q0.dtype), 1e-8)
        return c, dq

    c1, dq1 = one_step(jax.device_put(q0b, jax.devices()[0]),
                       jax.tree.map(lambda x: jax.device_put(
                           x, jax.devices()[0]), batched))
    mesh = pbatch.trial_mesh(N_DEV)
    sharded_data = pbatch.shard_batch(batched, mesh)
    q0s = jax.device_put(q0b, NamedSharding(
        mesh, P(pbatch.TRIAL_AXIS, None, None)))
    c2, dq2 = one_step(q0s, sharded_data)
    assert len(set(dq2.sharding.device_set)) == N_DEV
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dq2), np.asarray(dq1),
                               atol=1e-4, rtol=1e-3)


def test_kinetic_sharded_equals_single(problems):
    batched, q0b = problems
    subject = params_mod.get_subject("acinoset")
    B, N = q0b.shape[0], q0b.shape[1]
    stance = np.zeros((B, N, 4), np.float32)
    stance[:, N // 3: 2 * N // 3, :] = 1.0
    kbat = kn.KineticData(
        base=batched, stance=jnp.asarray(stance),
        grf_fixed=jnp.zeros((B, N, 4), jnp.float32),
        grf_xy_fixed=jnp.zeros((B, N, 4, 4), jnp.float32),
        use_fixed_grf=jnp.zeros((B,), jnp.float32),
        q_warm=q0b,
        tau_anchor=jnp.zeros((B, 1, 22), jnp.float32),
        tau_anchor_weight=jnp.zeros((B,), jnp.float32),
        ground_z=jnp.zeros((B,), jnp.float32))
    fte = kn.KineticFTE(kn.KineticConfig(use_gmm=False), subject)
    from cheetah_pose_estimation_tpu.solver import gn as gn_mod

    @jax.jit
    @jax.vmap
    def one_step(q0, data):
        c = fte._cost(q0, data, 1.0)
        g, H = fte._normal(q0, data, 1.0)
        dq = gn_mod._scaled_solve(g, H, jnp.asarray(10.0, q0.dtype), 1e-8)
        # the per-frame elimination's GRF active-set comparisons can flip
        # between layouts at boundary values (f32), giving discretely
        # different but equally valid steps — so compare step QUALITY
        # (cost at the trial point), not the step vector
        return c, fte._cost(q0 + dq, data, 1.0)

    c1, ct1 = one_step(q0b, kbat)
    mesh = pbatch.trial_mesh(N_DEV)
    sharded_data = pbatch.shard_batch(kbat, mesh)
    q0s = jax.device_put(q0b, NamedSharding(
        mesh, P(pbatch.TRIAL_AXIS, None, None)))
    c2, ct2 = one_step(q0s, sharded_data)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ct2), np.asarray(ct1), rtol=1e-3)
