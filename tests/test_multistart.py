"""Heading-multistart helpers: restart fan-out + per-trial argmin pick."""
import jax
import jax.numpy as jnp
import numpy as np

from cheetah_pose_estimation_tpu.parallel import batch as pbatch
from cheetah_pose_estimation_tpu.solver.gn import LMState


def _stub_run(target):
    """Solver stub: 'converges' to its init (restarts stay distinguishable)
    with a cost that rewards heading closeness to ``target``."""

    def run(q0, data):
        cost = jnp.sum((q0[:, 5] - target) ** 2) + data["bias"]
        z = jnp.zeros(())
        return LMState(q=q0, cost=cost, lam=z, nu=z, it=z, done=z,
                       n_accepted=z)

    return run


def test_multistart_picks_argmin_per_trial():
    B, N = 3, 4
    q0b = jnp.zeros((B, N, 54))
    data = {"bias": jnp.arange(B, dtype=jnp.float32)}
    # target heading 0.3 -> the +0.3 restart must win for every trial
    st = pbatch.multistart(_stub_run(0.3), q0b, data,
                           offsets=(0.0, 0.3, -0.3))
    assert st.q.shape == (B, N, 54)
    np.testing.assert_allclose(np.asarray(st.q[:, :, 5]), 0.3, atol=1e-6)
    # per-trial cost keeps the trial's own bias (gather is per-trial)
    np.testing.assert_allclose(np.asarray(st.cost), np.arange(B), atol=1e-6)


def test_multistart_no_worse_than_single_start():
    B, N = 2, 4
    q0b = jnp.zeros((B, N, 54))
    data = {"bias": jnp.zeros(B)}
    run = _stub_run(-0.3)
    st_ms = pbatch.multistart(run, q0b, data, offsets=(0.0, 0.3, -0.3))
    st_ss = jax.vmap(run)(q0b, data)
    assert np.all(np.asarray(st_ms.cost) <= np.asarray(st_ss.cost) + 1e-6)


def test_multistart_margin_keeps_unperturbed_on_near_tie():
    """An alternative restart within the cost margin must NOT displace the
    unperturbed init (near-ties are ambiguity, not basin escapes)."""
    B, N = 2, 4

    def run(q0, data):
        # offset 0 -> cost 1.0; any perturbed restart -> cost 0.995 (0.5%
        # better, inside the 1% margin) via a heading-dependent dip
        cost = 1.0 - 0.005 * jnp.minimum(jnp.abs(q0[0, 5]) / 0.3, 1.0)
        z = jnp.zeros(())
        return LMState(q=q0, cost=cost, lam=z, nu=z, it=z, done=z,
                       n_accepted=z)

    st = pbatch.multistart(run, jnp.zeros((B, N, 54)), {"unused": jnp.zeros(B)},
                           offsets=(0.0, 0.3, -0.3))
    np.testing.assert_allclose(np.asarray(st.q[:, :, 5]), 0.0, atol=1e-6)


def test_multistart_single_matches_batched_pick():
    N = 5
    q0 = jnp.zeros((N, 54))
    data = {"bias": jnp.asarray(0.0)}
    st = pbatch.multistart_single(_stub_run(0.3), q0, data,
                                  offsets=(0.0, 0.3, -0.3))
    assert st.q.shape == (N, 54)
    np.testing.assert_allclose(np.asarray(st.q[:, 5]), 0.3, atol=1e-6)
    assert float(st.cost) < 1e-6


def test_probe_multistart_selects_then_continues():
    """Demand-driven multistart: the probe picks the winning basin per
    trial (same margin rule), and only the winner is continued through the
    full solve (the full stub marks continuation in q[..., 0, 0])."""
    B, N = 3, 4
    probe = _stub_run(0.3)

    def full_run(q0, data):
        st = _stub_run(0.3)(q0, data)
        return st._replace(q=q0.at[0, 0].add(100.0))

    ms = pbatch.make_multistart_probe(probe, full_run,
                                      offsets=(0.0, 0.3, -0.3))
    st = ms(jnp.zeros((B, N, 54)), {"bias": jnp.zeros(B)})
    np.testing.assert_allclose(np.asarray(st.q[:, :, 5]), 0.3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.q[:, 0, 0]), 100.0, atol=1e-6)


def test_probe_multistart_margin_prefers_unperturbed():
    B, N = 2, 4

    def probe(q0, data):
        cost = 1.0 - 0.005 * jnp.minimum(jnp.abs(q0[0, 5]) / 0.3, 1.0)
        z = jnp.zeros(())
        return LMState(q=q0, cost=cost, lam=z, nu=z, it=z, done=z,
                       n_accepted=z)

    ms = pbatch.make_multistart_probe(probe, lambda q0, d: probe(q0, d),
                                      offsets=(0.0, 0.3, -0.3))
    st = ms(jnp.zeros((B, N, 54)), {"unused": jnp.zeros(B)})
    np.testing.assert_allclose(np.asarray(st.q[:, :, 5]), 0.0, atol=1e-6)


def test_probe_full_stage_split_covers_default_schedule():
    """PROBE_STAGES + FULL_STAGES must exactly reproduce the default
    annealing schedule of KinematicFTE.make_solver, otherwise the
    demand-driven path silently solves a different problem."""
    import inspect

    from cheetah_pose_estimation_tpu.solver import kinematic as kin

    default = inspect.signature(kin.KinematicFTE.make_solver) \
        .parameters["stages"].default
    assert pbatch.PROBE_STAGES + pbatch.FULL_STAGES == default


def test_pick_restart_nan_guard():
    """A NaN unperturbed lane must lose to any finite perturbed lane — the
    margin comparison is False against NaN, so without the guard the NaN
    lane wins (VERDICT r3 Weak #6; live during the r3 prior poisoning)."""
    B, N = 2, 4

    def run(q0, data):
        # unperturbed heading (0.0) -> NaN cost; perturbed -> finite
        trapped = jnp.abs(q0[0, 5]) < 1e-6
        cost = jnp.where(trapped, jnp.nan, jnp.abs(q0[0, 5]))
        z = jnp.zeros(())
        return LMState(q=q0, cost=cost, lam=z, nu=z, it=z, done=z,
                       n_accepted=z)

    st = pbatch.multistart(run, jnp.zeros((B, N, 54)),
                           {"unused": jnp.zeros(B)},
                           offsets=(0.0, 0.3, -0.3))
    assert np.isfinite(np.asarray(st.cost)).all()
    np.testing.assert_allclose(np.abs(np.asarray(st.q[:, :, 5])), 0.3,
                               atol=1e-6)


def test_pick_restart_all_nan_stays_unperturbed():
    """If every lane is non-finite the unperturbed restart is kept (no
    arbitrary perturbed state should ship)."""
    B, N = 1, 3

    def run(q0, data):
        z = jnp.zeros(())
        return LMState(q=q0, cost=jnp.full((), jnp.nan), lam=z, nu=z, it=z,
                       done=z, n_accepted=z)

    st = pbatch.multistart(run, jnp.zeros((B, N, 54)),
                           {"unused": jnp.zeros(B)},
                           offsets=(0.0, 0.3, -0.3))
    np.testing.assert_allclose(np.asarray(st.q[:, :, 5]), 0.0, atol=1e-6)
