"""Rigid-body EOM validation via physics invariants.

(The reference ships lambdified EOM oracles, but their pickled bytecode does
not survive loading under this Python version, so correctness is established
through backend-independent mechanics identities instead.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheetah_pose_estimation_tpu.dynamics import eom as E
from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as sk

SUBJ = P.get_subject("jules")


def _rand_state(seed=0, scale=0.4):
    rng = np.random.default_rng(seed)
    q = rng.normal(scale=scale, size=54)
    q[2] += 0.6
    dq = rng.normal(scale=1.0, size=54)
    return jnp.asarray(q), jnp.asarray(dq)


def test_mass_matrix_spd_symmetric():
    q, _ = _rand_state(0)
    M = np.asarray(E.mass_matrix(q, SUBJ))
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0, w.min()
    # translational block = total mass * I (all links translate with base)
    np.testing.assert_allclose(M[:3, :3], SUBJ.total_mass * np.eye(3),
                               atol=1e-9)


def test_newton_base_rows():
    """Rows 0:3 of M ddq + C + G equal total-mass * com acceleration + weight."""
    q, dq = _rand_state(1)
    ddq = jnp.asarray(np.random.default_rng(2).normal(scale=3.0, size=54))
    res = np.asarray(E.mass_matrix(q, SUBJ) @ ddq
                     + E.bias_terms(q, dq, SUBJ))
    # com acceleration via second-order jvp of com(q(t)) with q(t)=q+t dq+t^2/2 ddq
    com_fn = lambda qq: sk.com_position(qq, SUBJ)
    def com_t(t):
        return com_fn(q + t * dq + 0.5 * t * t * ddq)
    d2com = jax.jacfwd(jax.jacfwd(com_t))(0.0)
    expect = SUBJ.total_mass * (np.asarray(d2com)
                                + np.array([0.0, 0.0, E.GRAVITY]))
    np.testing.assert_allclose(res[:3], expect, rtol=1e-8, atol=1e-8)


def test_eom_matches_finite_difference_lagrangian():
    """d/dt (dKE/ddq) - dL/dq along an arbitrary smooth trajectory."""
    q, dq = _rand_state(3)
    ddq = jnp.asarray(np.random.default_rng(4).normal(scale=2.0, size=54))
    p_fn = lambda qq, dqq: jax.grad(E.kinetic_energy, argnums=1)(qq, dqq,
                                                                 SUBJ)
    eps = 1e-5
    p_plus = p_fn(q + eps * dq + 0.5 * eps**2 * ddq, dq + eps * ddq)
    p_minus = p_fn(q - eps * dq + 0.5 * eps**2 * ddq, dq - eps * ddq)
    dpdt = np.asarray((p_plus - p_minus) / (2 * eps))
    dke_dq = np.asarray(jax.grad(E.kinetic_energy, argnums=0)(q, dq, SUBJ))
    dpe_dq = np.asarray(jax.grad(E.potential_energy, argnums=0)(q, SUBJ))
    lhs = dpdt - dke_dq + dpe_dq
    res = np.asarray(E.mass_matrix(q, SUBJ) @ ddq
                     + E.bias_terms(q, dq, SUBJ))
    np.testing.assert_allclose(res, lhs, rtol=1e-4, atol=1e-4)


def test_energy_conservation_unforced():
    """Integrate M ddq = -(C+G) with RK4; total energy must be conserved."""
    q, dq = _rand_state(5, scale=0.2)
    dq = dq * 0.3

    def accel(qq, dqq):
        M = E.mass_matrix(qq, SUBJ)
        return jnp.linalg.solve(M, -E.bias_terms(qq, dqq, SUBJ))

    @jax.jit
    def rk4(state, dt):
        qq, dqq = state
        k1q, k1v = dqq, accel(qq, dqq)
        k2q, k2v = dqq + dt / 2 * k1v, accel(qq + dt / 2 * k1q,
                                             dqq + dt / 2 * k1v)
        k3q, k3v = dqq + dt / 2 * k2v, accel(qq + dt / 2 * k2q,
                                             dqq + dt / 2 * k2v)
        k4q, k4v = dqq + dt * k3v, accel(qq + dt * k3q, dqq + dt * k3v)
        qn = qq + dt / 6 * (k1q + 2 * k2q + 2 * k3q + k4q)
        vn = dqq + dt / 6 * (k1v + 2 * k2v + 2 * k3v + k4v)
        return (qn, vn)

    def energy(qq, dqq):
        return float(E.kinetic_energy(qq, dqq, SUBJ)
                     + E.potential_energy(qq, SUBJ))

    e0 = energy(q, dq)
    state = (q, dq)
    for _ in range(50):
        state = rk4(state, 1e-4)
    e1 = energy(*state)
    assert abs(e1 - e0) / abs(e0) < 1e-6, (e0, e1)


def test_grf_virtual_work_consistency():
    """B = J^T F: directional derivative of foot position dotted with force."""
    q, _ = _rand_state(6)
    rng = np.random.default_rng(7)
    gz = jnp.asarray(rng.uniform(0, 2, 4))
    gxy = jnp.asarray(rng.uniform(0, 1, (4, 4)))
    scale = SUBJ.total_mass * E.GRAVITY
    B = np.asarray(E.grf_generalized_forces(q, gz, gxy, SUBJ, scale))
    # base-translation rows carry the total force exactly
    D = E.POLYGON_D
    F = (np.asarray(gz)[:, None] * np.array([0, 0, 1.0])
         + np.asarray(gxy) @ D) * scale
    np.testing.assert_allclose(B[:3], F.sum(axis=0), rtol=1e-10)
    # virtual work along a random direction matches finite difference
    v = rng.normal(size=54)
    eps = 1e-6
    fp = E.foot_points(q + eps * v, SUBJ)
    fm = E.foot_points(q - eps * v, SUBJ)
    dw = float(jnp.sum((fp - fm) / (2 * eps) * jnp.asarray(F)))
    np.testing.assert_allclose(np.dot(B, v), dw, rtol=1e-5)


def test_torque_map_structure():
    tm = E.TORQUE_MAP
    assert tm.B.shape == (54, 22)
    # internal torques exert no net generalized force on base translation
    np.testing.assert_allclose(tm.B[:3], 0.0)
    # every column sums to zero (equal and opposite reaction)
    np.testing.assert_allclose(tm.B.sum(axis=0), 0.0, atol=1e-12)


@pytest.mark.slow
def test_eom_matches_reference_solution_in_flight():
    """Cross-validation against the reference's own physics-based solution:
    evaluating OUR EOM on the shipped fte_kinetic (q, dq, ddq, tau) must give
    near-zero residuals during flight phases (the reference solved its EOM to
    small slack there; stance frames carry the un-modeled GRF). This pins
    down the dynamics formulation including the torque-map conventions."""
    import json
    import pickle
    import os
    import jax.numpy as jnp

    trial = "/root/reference/data/test_set/2019_03_07/phantom/run"
    if not os.path.isdir(trial):
        pytest.skip("reference test_set missing")
    d = pickle.load(open(os.path.join(trial, "fte_kinetic_1",
                                      "fte.pickle"), "rb"))
    cj = json.load(open(os.path.join(trial, "grf", "autogen-contact.json")))
    subject = P.get_subject("phantom")
    scale = subject.total_mass * E.GRAVITY
    N = d["q"].shape[0]
    stance = np.zeros(N, bool)
    for seqs in cj["contacts"].values():
        if seqs is None:
            continue
        for s, e_, *_ in seqs:
            stance[max(s - cj["start_frame"], 0):
                   min(e_ - cj["start_frame"] + 1, N)] = True
    tau = np.zeros((N, 22))
    for col, name in enumerate(E.TORQUE_MAP.names):
        motor = name.rsplit(":", 1)[0]
        idx = [n for n in E.TORQUE_MAP.names
               if n.startswith(motor + ":")].index(name)
        tau[:, col] = d["tau"][motor][:, idx]
    flight, stance_r = [], []
    for t in range(3, N - 1):
        tg = E.torque_generalized_forces(jnp.asarray(tau[t]), scale)
        r = np.asarray(E.eom_residual(
            jnp.asarray(d["q"][t]), jnp.asarray(d["dq"][t]),
            jnp.asarray(d["ddq"][t]), jnp.zeros(4), jnp.zeros((4, 4)),
            subject, tau_forces=tg)) / scale
        (stance_r if stance[t] else flight).append(np.abs(r).max())
    assert np.mean(flight) < 0.15, np.mean(flight)      # ~their slack level
    assert np.mean(stance_r) > 5 * np.mean(flight)      # GRF dominates


def test_eom_residual_zero_for_static_equilibrium_direction():
    """At rest, residual = G - B; with GRF canceling gravity the base-z row
    vanishes."""
    q = jnp.zeros(54).at[2].set(0.6).at[5].set(np.pi)
    gz_each = SUBJ.total_mass * E.GRAVITY / 4.0 / (SUBJ.total_mass * E.GRAVITY)
    gz = jnp.full(4, gz_each)
    res = np.asarray(E.eom_residual(q, jnp.zeros(54), jnp.zeros(54), gz,
                                    jnp.zeros((4, 4)), SUBJ))
    np.testing.assert_allclose(res[2], 0.0, atol=1e-9)
