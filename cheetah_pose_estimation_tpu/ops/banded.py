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
    """
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
        Llower = Llower.at[k - 1, : N - k].set(Lrows[k:, B - k])
    return BlockBanded(diag=Ldiag, lower=Llower)


def solve_factored(L: BlockBanded, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b given the banded Cholesky factor. b: (N, d)."""
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
