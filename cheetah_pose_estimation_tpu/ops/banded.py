"""Symmetric positive-definite block-banded linear algebra.

The FTE normal equations are block-banded in time: state q_t couples only
q_{t-3}..q_{t+3} through the constant-acceleration (third-difference) stencil,
while measurement/prior terms are block-diagonal. This module provides the
banded Cholesky factorization and solves that replace the reference's
IPOPT + HSL MA97 sparse multifrontal LDL^T (``acinoset_opt.py:611-617``) with
an XLA-friendly ``lax.scan`` over time — vmappable over a batch of trials and
shardable over a device mesh.

Storage layout for a symmetric block-banded matrix H with N diagonal blocks of
size d and lower bandwidth B:

* ``diag``: (N, d, d) — H[t, t]
* ``lower``: (B, N, d, d) — ``lower[k-1, t] = H[t+k, t]`` (the block coupling
  frame t+k with frame t); entries with t >= N-k are ignored/zero.

The Cholesky factor L shares the layout (its diag blocks are lower-triangular).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class BlockBanded(NamedTuple):
    diag: jnp.ndarray   # (N, d, d)
    lower: jnp.ndarray  # (B, N, d, d); lower[k-1, t] = H[t+k, t]

    @property
    def nblocks(self) -> int:
        return self.diag.shape[0]

    @property
    def bandwidth(self) -> int:
        return self.lower.shape[0]

    @property
    def block(self) -> int:
        return self.diag.shape[-1]


def matvec(H: BlockBanded, x: jnp.ndarray) -> jnp.ndarray:
    """H @ x for x of shape (N, d)."""
    B = H.bandwidth
    y = jnp.einsum("tij,tj->ti", H.diag, x)
    for k in range(1, B + 1):
        Lk = H.lower[k - 1, : H.nblocks - k]          # (N-k, d, d)
        # lower part: y[t+k] += H[t+k,t] x[t]
        y = y.at[k:].add(jnp.einsum("tij,tj->ti", Lk, x[:-k]))
        # upper part: y[t] += H[t+k,t]^T x[t+k]
        y = y.at[:-k].add(jnp.einsum("tji,tj->ti", Lk, x[k:]))
    return y


def to_dense(H: BlockBanded) -> jnp.ndarray:
    """Materialize as a dense (N*d, N*d) matrix (tests only)."""
    N, d = H.nblocks, H.block
    A = jnp.zeros((N * d, N * d), H.diag.dtype)
    for t in range(N):
        A = A.at[t * d:(t + 1) * d, t * d:(t + 1) * d].set(H.diag[t])
    for k in range(1, H.bandwidth + 1):
        for t in range(N - k):
            blk = H.lower[k - 1, t]
            A = A.at[(t + k) * d:(t + k + 1) * d, t * d:(t + 1) * d].set(blk)
            A = A.at[t * d:(t + 1) * d, (t + k) * d:(t + k + 1) * d].set(blk.T)
    return A


def cholesky(H: BlockBanded) -> BlockBanded:
    """Blocked banded Cholesky H = L L^T via lax.scan over time.

    The carry holds the previous B block-rows of L; boundary rows use identity
    diagonal placeholders (multiplied by structurally-zero H blocks, so they
    never contaminate the result).

    All matmuls in this module run at "highest" precision regardless of the
    caller's context: on TPU the f32 default is bf16 passes, which is fine
    for the cost/residual evaluations around the solver but corrupts the
    factorizations themselves (measured: the CR path returned steps 10%
    off when benchmarked outside the solver's precision scope).
    """
    with jax.default_matmul_precision("highest"):
        return _cholesky(H)


def _cholesky(H: BlockBanded) -> BlockBanded:
    N, B, d = H.nblocks, H.bandwidth, H.block
    dtype = H.diag.dtype
    eye = jnp.eye(d, dtype=dtype)

    # rows[i] = L-row of frame (t-1-i): blocks [L[s, s-B], ..., L[s, s-1], L[s, s]]
    init_rows = jnp.zeros((B, B + 1, d, d), dtype)
    init_rows = init_rows.at[:, B].set(jnp.broadcast_to(eye, (B, d, d)))

    # inputs at step t: H[t,t] and H[t, t-j] for j=1..B
    Hdiag = H.diag
    Hoff = jnp.zeros((B, N, d, d), dtype)
    for k in range(1, B + 1):
        # H[t, t-k] = lower[k-1, t-k]
        if N - k > 0:
            Hoff = Hoff.at[k - 1, k:].set(H.lower[k - 1, : N - k])

    def step(rows, inp):
        hdiag, hoff = inp  # hoff[j-1] = H[t, t-j]
        Lrow = [None] * (B + 1)  # Lrow[B - j] = L[t, t-j]; Lrow[B] = L[t,t]
        for j in range(B, 0, -1):
            M = hoff[j - 1]
            for k in range(j + 1, B + 1):
                # L[t-j, t-k] = rows[j-1][B - (k - j)]
                M = M - Lrow[B - k] @ rows[j - 1, B - (k - j)].T
            Ldiag_prev = rows[j - 1, B]  # L[t-j, t-j]
            # X Ldiag_prev^T = M  =>  X = M @ inv(Ldiag_prev)^T
            Lrow[B - j] = solve_triangular(
                Ldiag_prev, M.T, lower=True, trans=0).T
        S = hdiag
        for k in range(1, B + 1):
            S = S - Lrow[B - k] @ Lrow[B - k].T
        Lrow[B] = jnp.linalg.cholesky(S)
        Lrow_arr = jnp.stack(Lrow, axis=0)  # (B+1, d, d)
        new_rows = jnp.concatenate([Lrow_arr[None], rows[:-1]], axis=0)
        return new_rows, Lrow_arr

    _, Lrows = jax.lax.scan(step, init_rows, (Hdiag, jnp.moveaxis(Hoff, 0, 1)))
    # repackage: Ldiag[t] = Lrows[t, B]; Llower[k-1, t] = L[t+k, t] = Lrows[t+k, B-k]
    Ldiag = Lrows[:, B]
    Llower = jnp.zeros((B, N, d, d), dtype)
    for k in range(1, B + 1):
        if N - k > 0:
            Llower = Llower.at[k - 1, : N - k].set(Lrows[k:, B - k])
    return BlockBanded(diag=Ldiag, lower=Llower)


def solve_factored(L: BlockBanded, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b given the banded Cholesky factor. b: (N, d)."""
    with jax.default_matmul_precision("highest"):
        return _solve_factored(L, b)


def _solve_factored(L: BlockBanded, b: jnp.ndarray) -> jnp.ndarray:
    N, B, d = L.nblocks, L.bandwidth, L.block
    dtype = L.diag.dtype

    # forward: L y = b ;  y[t] = Ldiag[t]^-1 (b[t] - sum_k L[t, t-k] y[t-k])
    Loff = jnp.zeros((B, N, d, d), dtype)
    for k in range(1, B + 1):
        Loff = Loff.at[k - 1, k:].set(L.lower[k - 1, : N - k])  # L[t, t-k]

    def fwd(carry, inp):
        ldiag, loff, bt = inp
        s = bt
        for k in range(1, B + 1):
            s = s - loff[k - 1] @ carry[k - 1]
        y = solve_triangular(ldiag, s, lower=True)
        new_carry = jnp.concatenate([y[None], carry[:-1]], axis=0)
        return new_carry, y

    carry0 = jnp.zeros((B, d), dtype)
    _, y = jax.lax.scan(fwd, carry0, (L.diag, jnp.moveaxis(Loff, 0, 1), b))

    # backward: L^T x = y ; x[t] = Ldiag[t]^-T (y[t] - sum_k L[t+k, t]^T x[t+k])
    Lup = jnp.zeros((B, N, d, d), dtype)
    for k in range(1, B + 1):
        Lup = Lup.at[k - 1, : N - k].set(L.lower[k - 1, : N - k])  # L[t+k, t]

    def bwd(carry, inp):
        ldiag, lup, yt = inp
        s = yt
        for k in range(1, B + 1):
            s = s - lup[k - 1].T @ carry[k - 1]
        x = solve_triangular(ldiag, s, lower=True, trans=1)
        new_carry = jnp.concatenate([x[None], carry[:-1]], axis=0)
        return new_carry, x

    _, x_rev = jax.lax.scan(bwd, carry0,
                            (L.diag[::-1], jnp.moveaxis(Lup, 0, 1)[::-1],
                             y[::-1]))
    return x_rev[::-1]


def solve(H: BlockBanded, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for SPD block-banded H. b: (N, d)."""
    return solve_factored(cholesky(H), b)


def _tridiagonalize(H: BlockBanded, b: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Regroup a block-banded SPD system into block-tridiagonal form.

    Frames are grouped ``s = bandwidth`` at a time into super-blocks of size
    D = s*d; couplings then reach only the adjacent super-block, giving the
    tridiagonal system  C_i x_{i-1} + A_i x_i + C_{i+1}^T x_{i+1} = b_i.
    Padded frames get identity diagonal / zero rhs (fully decoupled).

    Returns (A: (M, D, D), C: (M, D, D) with C[0] = 0, bs: (M, D)).
    """
    N, s, d = H.nblocks, H.bandwidth, H.block
    dtype = H.diag.dtype
    M = -(-N // s)
    Np = M * s
    eye = jnp.eye(d, dtype=dtype)
    diag = jnp.concatenate(
        [H.diag, jnp.broadcast_to(eye, (Np - N, d, d))], axis=0)
    # zero structurally-invalid trailing entries, then pad the frame axis
    lower = jnp.zeros((s, Np, d, d), dtype)
    for k in range(1, s + 1):
        nv = max(N - k, 0)
        if nv:
            lower = lower.at[k - 1, :nv].set(H.lower[k - 1, :nv])

    A = jnp.zeros((M, s, s, d, d), dtype)
    C = jnp.zeros((M, s, s, d, d), dtype)
    idx = jnp.arange(M) * s
    for u in range(s):
        A = A.at[:, u, u].set(diag[idx + u])
        for v in range(u):
            blk = lower[u - v - 1][idx + v]      # H[i*s+u, i*s+v]
            A = A.at[:, u, v].set(blk)
            A = A.at[:, v, u].set(jnp.swapaxes(blk, -1, -2))
        for v in range(u, s):
            # C_i[u, v] = H[i*s+u, (i-1)*s+v], offset k = s + u - v in [1, s]
            k = s + u - v
            blk = lower[k - 1][jnp.maximum(idx - s + v, 0)]
            C = C.at[1:, u, v].set(blk[1:])
    A = A.transpose(0, 1, 3, 2, 4).reshape(M, s * d, s * d)
    C = C.transpose(0, 1, 3, 2, 4).reshape(M, s * d, s * d)
    bs = jnp.concatenate([b, jnp.zeros((Np - N, d), dtype)],
                         axis=0).reshape(M, s * d)
    return A, C, bs


def _chol_solve_batched(L, X):
    y = solve_triangular(L, X, lower=True)
    return solve_triangular(L, y, lower=True, trans=1)


def _cr_factor_tridiag(A: jnp.ndarray, C: jnp.ndarray):
    """Cyclic-reduction factorization of an SPD block-tridiagonal system.

    The system is  C_i x_{i-1} + A_i x_i + C_{i+1}^T x_{i+1} = b_i
    (C[0] = 0). Each level eliminates the odd-indexed blocks with batched
    Cholesky solves — O(log M) levels of large batched matmuls instead of an
    O(M) sequential scan, the parallel-in-time factorization strategy for
    long trials (SURVEY §5/§7: cyclic reduction over the time axis). The
    eliminated diagonal blocks are Schur complements of an SPD matrix, so
    every level stays SPD and Cholesky-factorizable.

    Returns (levels, L0): per level the (Co, Cr, Ce, Lo) blocks that the
    O(M D^2) substitution pass needs, and the final 1-block factor —
    factorization is separated from substitution so a solve can be repeated
    on a new right-hand side (iterative refinement) without the O(M D^3)
    matmul work.
    """
    M, D = A.shape[0], A.shape[-1]
    dtype = A.dtype

    levels = []
    while M > 1:
        if M % 2 == 1:
            A = jnp.concatenate(
                [A, jnp.eye(D, dtype=dtype)[None]], axis=0)
            C = jnp.concatenate([C, jnp.zeros((1, D, D), dtype)], axis=0)
            M += 1
        Ao, Co = A[1::2], C[1::2]                       # odd i = 2j+1
        Ae, Ce = A[0::2], C[0::2]                       # even i = 2j (kept)
        K = M // 2
        Lo = jnp.linalg.cholesky(Ao)                    # (K, D, D)
        # right-neighbor coupling of odd 2j+1 is C_{2j+2}; none for i = M-1
        Cr = jnp.concatenate([Ce[1:], jnp.zeros((1, D, D), dtype)], axis=0)
        # A_o^{-1} [C_o, C_r^T] in one batched triangular solve pair
        rhs = jnp.concatenate([Co, jnp.swapaxes(Cr, -1, -2)], axis=-1)
        sol = jax.vmap(_chol_solve_batched)(Lo, rhs)
        Gi = sol[..., :D]                               # G_j = A^{-1} C_{2j+1}
        Hi = sol[..., D:]                               # H_j = A^{-1} C_{2j+2}^T
        # elimination of x_{2j+1} = y_j - G_j x_{2j} - H_j x_{2j+2} into the
        # kept rows; the left odd neighbor of kept 2j is index j-1 (shift by 1)
        Hl = jnp.concatenate([jnp.zeros((1, D, D), dtype), Hi[:-1]], axis=0)
        Gl = jnp.concatenate([jnp.zeros((1, D, D), dtype), Gi[:-1]], axis=0)
        CoT = jnp.swapaxes(Co, -1, -2)
        A_new = Ae - Ce @ Hl - CoT @ Gi
        C_new = -(Ce @ Gl)
        levels.append((Co, Cr, Ce, Lo))
        A, C = A_new, C_new
        M = K

    L0 = jnp.linalg.cholesky(A[0])
    return levels, L0


def _cr_apply(levels, L0, b: jnp.ndarray) -> jnp.ndarray:
    """Substitution pass of the CR factorization: O(M D^2) per call."""
    dtype = b.dtype
    # downward: eliminate odd entries from the rhs level by level
    bos = []
    for Co, Cr, Ce, Lo in levels:
        if b.shape[0] % 2 == 1:
            b = jnp.concatenate(
                [b, jnp.zeros((1, b.shape[-1]), dtype)], axis=0)
        bo, be = b[1::2], b[0::2]
        yi = jax.vmap(_chol_solve_batched)(Lo, bo[..., None])[..., 0]
        yl = jnp.concatenate([jnp.zeros((1, b.shape[-1]), dtype), yi[:-1]],
                             axis=0)
        CoT = jnp.swapaxes(Co, -1, -2)
        b = be - jnp.einsum("kij,kj->ki", Ce, yl) \
            - jnp.einsum("kij,kj->ki", CoT, yi)
        bos.append(bo)

    x = solve_triangular(
        L0, solve_triangular(L0, b[0], lower=True), lower=True, trans=1)[None]

    for (Co, Cr, Ce, Lo), bo in zip(reversed(levels), reversed(bos)):
        K = Co.shape[0]
        # a deeper level may have padded its odd entry count; the pad is
        # decoupled (identity block, zero rhs -> zero solution), so trim
        x = x[:K]
        # x holds the kept (even) entries; recover the odd ones:
        # x_{2j+1} = A^{-1} (b - C_{2j+1} x_{2j} - C_{2j+2}^T x_{2j+2})
        x_right = jnp.concatenate(
            [x[1:], jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0)
        r = bo - jnp.einsum("kij,kj->ki", Co, x) \
            - jnp.einsum("kji,kj->ki", Cr, x_right)
        xo = jax.vmap(_chol_solve_batched)(Lo, r[..., None])[..., 0]
        x = jnp.stack([x, xo], axis=1).reshape(2 * K, -1)
    return x


def cr_solve(H: BlockBanded, b: jnp.ndarray, refine: int = 1) -> jnp.ndarray:
    """Solve H x = b by block cyclic reduction over the time axis.

    Same interface as :func:`solve`; O(log N) parallel depth instead of the
    scan's O(N), at ~2x the FLOPs. The method of choice for long trials or
    small batch counts where the sequential scan underutilizes the chip.

    ``refine`` extra substitution passes of iterative refinement
    (x += H^{-1}(b - H x), reusing the factorization) recover the f32
    accuracy the deeper Schur-complement recursion loses relative to the
    sequential banded Cholesky: each pass contracts the error by the
    solver's own relative error (~1e-3 raw), and costs only the O(M D^2)
    substitution + one banded matvec — the O(M D^3) factor work is not
    repeated. Measured at (B=10, N=64, d=54) production shape: raw CR is
    ~1e-1 off the scan under default TPU matmul precision and ~1e-3 at
    "highest"; with one refinement pass the END-TO-END relative error vs
    the scan on real damped normal systems is ~7e-4 at both production
    shapes (docs/artifacts/linsolve_bench.json — the authoritative
    number; idealized well-conditioned systems refine further, but quote
    the bench).
    """
    with jax.default_matmul_precision("highest"):
        N, d = H.nblocks, H.block
        A, C, bs = _tridiagonalize(H, b)
        levels, L0 = _cr_factor_tridiag(A, C)
        x = _cr_apply(levels, L0, bs)[: bs.shape[0]]
        xb = x.reshape(-1, d)[:N]
        for _ in range(refine):
            r = b - matvec(H, xb)
            rs = jnp.concatenate(
                [r, jnp.zeros((bs.shape[0] * bs.shape[1] // d - N, d),
                              r.dtype)], axis=0).reshape(bs.shape)
            dx = _cr_apply(levels, L0, rs)[: bs.shape[0]]
            xb = xb + dx.reshape(-1, d)[:N]
        return xb


def add_diag_damping(H: BlockBanded, lam: jnp.ndarray,
                     scale: jnp.ndarray | None = None) -> BlockBanded:
    """Levenberg damping: H + lam * diag(scale). scale: (N, d) or None."""
    d = H.block
    eye = jnp.eye(d, dtype=H.diag.dtype)
    if scale is None:
        damp = lam * eye
        return H._replace(diag=H.diag + damp)
    return H._replace(
        diag=H.diag + lam * jax.vmap(jnp.diag)(scale))


def logdet_from_factor(L: BlockBanded) -> jnp.ndarray:
    """log det(H) = 2 sum log diag(L)."""
    dd = jnp.diagonal(L.diag, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(dd))
