import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cheetah_pose_estimation_tpu.ops import banded


def _random_spd_banded(rng, N, d, B, dtype=np.float64):
    """Build an SPD block-banded matrix by forming A^T A + c I from a banded A."""
    dense = np.zeros((N * d, N * d))
    for t in range(N):
        for s in range(max(0, t - B), min(N, t + B + 1)):
            if abs(t - s) <= B:
                blk = rng.normal(size=(d, d)) * 0.3
                dense[t * d:(t + 1) * d, s * d:(s + 1) * d] = blk
    H = dense.T @ dense
    # zero out anything outside the band that A^T A created beyond B... A^T A
    # has bandwidth 2B; instead build SPD banded directly by truncation + diag
    Hb = np.zeros_like(H)
    for t in range(N):
        for s in range(N):
            if abs(t - s) <= B:
                Hb[t * d:(t + 1) * d, s * d:(s + 1) * d] = \
                    H[t * d:(t + 1) * d, s * d:(s + 1) * d]
    Hb = 0.5 * (Hb + Hb.T) + np.eye(N * d) * (np.abs(H).sum() / (N * d))
    diag = np.stack([Hb[t * d:(t + 1) * d, t * d:(t + 1) * d]
                     for t in range(N)])
    lower = np.zeros((B, N, d, d))
    for k in range(1, B + 1):
        for t in range(N - k):
            lower[k - 1, t] = Hb[(t + k) * d:(t + k + 1) * d,
                                 t * d:(t + 1) * d]
    return banded.BlockBanded(jnp.asarray(diag, dtype),
                              jnp.asarray(lower, dtype)), Hb


def test_matvec_and_to_dense():
    rng = np.random.default_rng(0)
    H, Hd = _random_spd_banded(rng, N=7, d=4, B=3)
    x = rng.normal(size=(7, 4))
    y = np.asarray(banded.matvec(H, jnp.asarray(x)))
    np.testing.assert_allclose(y.ravel(), Hd @ x.ravel(), rtol=1e-10, atol=0)
    np.testing.assert_allclose(np.asarray(banded.to_dense(H)), Hd,
                               rtol=0, atol=1e-12)


def test_cholesky_solve_matches_dense():
    rng = np.random.default_rng(1)
    for (N, d, B) in [(5, 3, 1), (9, 4, 3), (20, 6, 3), (4, 5, 3)]:
        H, Hd = _random_spd_banded(rng, N, d, B)
        b = rng.normal(size=(N, d))
        x = np.asarray(banded.solve(H, jnp.asarray(b)))
        ref = np.linalg.solve(Hd, b.ravel()).reshape(N, d)
        np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-10)


def test_cholesky_factor_logdet():
    rng = np.random.default_rng(2)
    H, Hd = _random_spd_banded(rng, 8, 4, 2)
    L = banded.cholesky(H)
    ld = float(banded.logdet_from_factor(L))
    sign, ref = np.linalg.slogdet(Hd)
    assert sign > 0
    np.testing.assert_allclose(ld, ref, rtol=1e-10)


def test_vmap_batch_solve():
    rng = np.random.default_rng(3)
    Hs, Hds, bs = [], [], []
    for i in range(4):
        H, Hd = _random_spd_banded(rng, 6, 3, 2)
        Hs.append(H)
        Hds.append(Hd)
        bs.append(rng.normal(size=(6, 3)))
    Hb = banded.BlockBanded(jnp.stack([h.diag for h in Hs]),
                            jnp.stack([h.lower for h in Hs]))
    bb = jnp.asarray(np.stack(bs))
    xs = np.asarray(jax.vmap(banded.solve)(Hb, bb))
    for i in range(4):
        ref = np.linalg.solve(Hds[i], bs[i].ravel()).reshape(6, 3)
        np.testing.assert_allclose(xs[i], ref, rtol=1e-8, atol=1e-10)


def test_damping():
    rng = np.random.default_rng(4)
    H, Hd = _random_spd_banded(rng, 5, 3, 2)
    lam = jnp.asarray(0.7)
    Hd2 = np.asarray(banded.to_dense(banded.add_diag_damping(H, lam)))
    np.testing.assert_allclose(Hd2, Hd + 0.7 * np.eye(15), atol=1e-12)
    scale = jnp.asarray(rng.uniform(1, 2, size=(5, 3)))
    Hd3 = np.asarray(banded.to_dense(banded.add_diag_damping(H, lam, scale)))
    np.testing.assert_allclose(
        Hd3, Hd + 0.7 * np.diag(np.asarray(scale).ravel()), atol=1e-12)


@pytest.mark.parametrize("N,d,B", [(1, 4, 3), (2, 4, 3), (3, 4, 3),
                                   (7, 5, 3), (16, 6, 3), (29, 6, 3),
                                   (64, 4, 3), (10, 5, 2), (9, 7, 1)])
def test_cr_solve_matches_dense(N, d, B):
    """Block cyclic reduction agrees with the dense solve for every shape
    class: N below/at/above the bandwidth, odd block counts at every level,
    and non-default bandwidths."""
    rng = np.random.default_rng(N * 100 + d)
    H, Hd = _random_spd_banded(rng, N, d, B)
    b = rng.normal(size=(N, d))
    x = np.asarray(banded.cr_solve(H, jnp.asarray(b)))
    ref = np.linalg.solve(Hd, b.ravel()).reshape(N, d)
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-10)


def test_cr_solve_vmap():
    rng = np.random.default_rng(7)
    Hs, Hds, bs = [], [], []
    for i in range(3):
        H, Hd = _random_spd_banded(rng, 12, 4, 3)
        Hs.append(H)
        Hds.append(Hd)
        bs.append(rng.normal(size=(12, 4)))
    Hb = banded.BlockBanded(jnp.stack([h.diag for h in Hs]),
                            jnp.stack([h.lower for h in Hs]))
    xs = np.asarray(jax.vmap(banded.cr_solve)(Hb, jnp.asarray(np.stack(bs))))
    for i in range(3):
        ref = np.linalg.solve(Hds[i], bs[i].ravel()).reshape(12, 4)
        np.testing.assert_allclose(xs[i], ref, rtol=1e-8, atol=1e-10)


def test_bordered_solve_matches_dense():
    """gn._bordered_solve (banded Schur on the border columns) must match a
    dense solve of the full bordered SPD system."""
    import numpy as np

    from cheetah_pose_estimation_tpu.ops import banded
    from cheetah_pose_estimation_tpu.solver import gn

    rng = np.random.default_rng(0)
    N, d, B, C = 7, 4, 2, 3
    lam = 0.1
    # random SPD block-banded H
    A = rng.normal(size=(N * d, N * d))
    H_dense = A @ A.T + 5.0 * N * d * np.eye(N * d)
    for i in range(N):
        for j in range(N):
            if abs(i - j) > B:
                H_dense[i * d:(i + 1) * d, j * d:(j + 1) * d] = 0.0
    diag = np.stack([H_dense[t * d:(t + 1) * d, t * d:(t + 1) * d]
                     for t in range(N)])
    lower = np.zeros((B, N, d, d))
    for k in range(1, B + 1):
        for t in range(N - k):
            lower[k - 1, t] = H_dense[(t + k) * d:(t + k + 1) * d,
                                      t * d:(t + 1) * d]
    Bmat = rng.normal(size=(N, d, C))
    Htt = rng.uniform(5.0, 10.0, size=C)
    gq = rng.normal(size=(N, d))
    gtau = rng.normal(size=C)

    H = banded.BlockBanded(jnp.asarray(diag), jnp.asarray(lower))
    dq, dtau = gn._bordered_solve(jnp.asarray(gq), H, jnp.asarray(gtau),
                                  jnp.asarray(Bmat), jnp.asarray(Htt),
                                  jnp.asarray(lam), 1e-12)

    # dense reference with the SAME scaled-Marquardt damping
    s = 1.0 / np.sqrt(np.diagonal(H_dense).copy())
    st = 1.0 / np.sqrt(Htt)
    D_full = np.zeros((N * d + C, N * d + C))
    D_full[:N * d, :N * d] = H_dense
    D_full[:N * d, N * d:] = Bmat.reshape(N * d, C)
    D_full[N * d:, :N * d] = Bmat.reshape(N * d, C).T
    D_full[N * d:, N * d:] = np.diag(Htt)
    S = np.concatenate([s, st])
    Ds = S[:, None] * D_full * S[None, :] + lam * np.eye(N * d + C)
    rhs = -np.concatenate([gq.reshape(-1), gtau]) * S
    sol = S * np.linalg.solve(Ds, rhs)
    np.testing.assert_allclose(np.asarray(dq).reshape(-1), sol[:N * d],
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dtau), sol[N * d:],
                               rtol=1e-8, atol=1e-10)
