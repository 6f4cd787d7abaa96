"""Fused Pallas banded-Cholesky solve: correctness vs the XLA scan path.

CPU CI runs the kernel in interpreter mode; on a real TPU the same code
compiles through Mosaic (exercised by bench/driver runs).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cheetah_pose_estimation_tpu.ops import banded
from cheetah_pose_estimation_tpu.ops import pallas_banded as pb


def _spd_banded(rng, N, d, B):
    dense = np.zeros((N * d, N * d))
    for t in range(N):
        for s in range(max(0, t - B), min(N, t + B + 1)):
            dense[t * d:(t + 1) * d, s * d:(s + 1) * d] = \
                rng.normal(size=(d, d)) * 0.3
    Hd = dense.T @ dense
    Hb = np.zeros_like(Hd)
    for t in range(N):
        for s in range(N):
            if abs(t - s) <= B:
                Hb[t * d:(t + 1) * d, s * d:(s + 1) * d] = \
                    Hd[t * d:(t + 1) * d, s * d:(s + 1) * d]
    Hb = 0.5 * (Hb + Hb.T) + np.eye(N * d) * np.abs(Hd).sum() / (N * d)
    diag = np.stack([Hb[t * d:(t + 1) * d, t * d:(t + 1) * d]
                     for t in range(N)])
    lower = np.zeros((B, N, d, d))
    for k in range(1, B + 1):
        for t in range(N - k):
            lower[k - 1, t] = Hb[(t + k) * d:(t + k + 1) * d,
                                 t * d:(t + 1) * d]
    return banded.BlockBanded(jnp.asarray(diag, jnp.float32),
                              jnp.asarray(lower, jnp.float32)), Hb


_INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("N,d", [(8, 54), (16, 30), (5, 64)])
def test_matches_dense_solution(N, d):
    rng = np.random.default_rng(N + d)
    H, Hb = _spd_banded(rng, N, d, 3)
    b = rng.normal(size=(N, d)).astype(np.float32)
    ref = np.linalg.solve(Hb, b.astype(np.float64).ravel()).reshape(N, d)
    x = np.asarray(pb.pallas_banded_solve(H, jnp.asarray(b),
                                          interpret=_INTERPRET))
    scale = np.abs(ref).max()
    assert np.abs(x - ref).max() / scale < 5e-5


def test_matches_xla_scan_path():
    rng = np.random.default_rng(0)
    H, _ = _spd_banded(rng, 12, 54, 3)
    b = jnp.asarray(rng.normal(size=(12, 54)), jnp.float32)
    x = np.asarray(pb.pallas_banded_solve(H, b, interpret=_INTERPRET))
    y = np.asarray(jax.jit(banded.solve)(H, b))
    np.testing.assert_allclose(x, y, rtol=0, atol=2e-4)


def test_batched_entry_matches_per_trial():
    """The batched kernel (trials vectorized INSIDE the elimination) must
    reproduce each trial's individual solution."""
    rng = np.random.default_rng(7)
    Hs, bs, refs = [], [], []
    for i in range(3):
        H, Hb = _spd_banded(rng, 10, 54, 3)
        b = rng.normal(size=(10, 54)).astype(np.float32)
        Hs.append(H)
        bs.append(b)
        refs.append(np.linalg.solve(
            Hb, b.astype(np.float64).ravel()).reshape(10, 54))
    diag = jnp.stack([H.diag for H in Hs])
    lower = jnp.stack([H.lower for H in Hs])
    bb = jnp.asarray(np.stack(bs))
    x = np.asarray(pb.pallas_banded_solve_batched(
        diag, lower, bb, interpret=_INTERPRET))
    for i in range(3):
        scale = np.abs(refs[i]).max()
        assert np.abs(x[i] - refs[i]).max() / scale < 5e-5, i


def test_collective_vmap_rule_matches_per_trial():
    """pb.solve under jax.vmap must route the whole batch into one kernel
    call (custom_vmap rule) and agree with unvmapped per-trial solves."""
    rng = np.random.default_rng(11)
    Hs, bs = [], []
    for i in range(3):
        H, _ = _spd_banded(rng, 9, 54, 3)
        Hs.append(H)
        bs.append(rng.normal(size=(9, 54)).astype(np.float32))
    diag = jnp.stack([H.diag for H in Hs])
    lower = jnp.stack([H.lower for H in Hs])
    bb = jnp.asarray(np.stack(bs))
    xv = np.asarray(jax.jit(jax.vmap(pb.solve))(diag, lower, bb))
    for i in range(3):
        x1 = np.asarray(pb.solve(diag[i], lower[i], bb[i]))
        np.testing.assert_allclose(xv[i], x1, rtol=2e-4, atol=2e-5)
