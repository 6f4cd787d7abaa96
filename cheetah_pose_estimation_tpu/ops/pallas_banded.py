"""Fused block-banded Cholesky solve as a Pallas TPU kernel.

The XLA path (``ops.banded``) lowers the factorization to a ``lax.scan``
whose every step dispatches several small (54x54) linalg ops; this kernel
fuses the whole factorize + forward/backward substitution for one trial into
a single Pallas call: one grid, all block state held in VMEM scratch across
the sequential time steps, in-kernel unrolled Cholesky/triangular solves on
64-padded tiles (MXU for the block products, VPU for the eliminations).

Layout (matches ops.banded.BlockBanded, blocks zero-padded from d to 64):
  diag  (N, 64, 64), lower (B, N, 64, 64) with lower[k-1, t] = H[t+k, t],
  rhs (N, 64)  ->  solution (N, 64).

Bandwidth is fixed at B = 3 (the constant-acceleration stencil).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import banded

D = 64          # padded block size (TPU lane-friendly)
BW = 3          # bandwidth


def _row_ids(dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (D, D), 0)


def _col_ids(dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (D, D), 1)


def _chol64(a):
    """Cholesky of a 64x64 SPD tile by masked right-looking elimination.

    Mosaic has no value-level dynamic_slice, so column extraction/update use
    broadcasted-iota masks (full-tile VPU ops per step; 64 steps).
    """
    cols = _col_ids()

    def col_step(j, carry):
        a_c, l_c = carry
        colmask = (cols == j).astype(a_c.dtype)              # (D, D)
        col = jnp.sum(a_c * colmask, axis=1)                 # (D,) = a[:, j]
        rowvec = jax.lax.broadcasted_iota(jnp.int32, (D,), 0)
        ajj = jnp.sum(jnp.where(rowvec == j, col, 0.0))
        inv = jax.lax.rsqrt(jnp.maximum(ajj, 1e-30))
        colL = jnp.where(rowvec >= j, col * inv, 0.0)
        l_c = l_c + colL[:, None] * colmask
        a_c = a_c - colL[:, None] * colL[None, :]
        return a_c, l_c

    _, l = jax.lax.fori_loop(0, D, col_step, (a, jnp.zeros_like(a)))
    return l


def _trsm_lower(l, b):
    """Solve L X = B (L lower-triangular 64x64, B (64, K)): masked forward
    substitution."""
    rowvec = jax.lax.broadcasted_iota(jnp.int32, (D,), 0)

    def row_step(i, x):
        rmask = (_row_ids() == i).astype(l.dtype)            # (D, D)
        li = jnp.sum(l * rmask, axis=0)                      # (D,) = L[i, :]
        lii = jnp.sum(jnp.where(rowvec == i, li, 0.0))
        acc = jnp.dot(li[None, :], x,
                      preferred_element_type=x.dtype)[0]    # (K,)
        bi = jnp.sum(jnp.where(rowvec[:, None] == i, b, 0.0), axis=0)
        xi = (bi - acc) / lii                                # x[i] (sum term
        # excludes x[i] itself: x[i] is still 0 at this point)
        return x + jnp.where(rowvec[:, None] == i, xi[None, :], 0.0)

    return jax.lax.fori_loop(0, D, row_step, jnp.zeros_like(b))


def _trsm_lower_t(l, b):
    """Solve L^T X = B: masked backward substitution."""
    rowvec = jax.lax.broadcasted_iota(jnp.int32, (D,), 0)
    cols = _col_ids()

    def row_step(k, x):
        i = D - 1 - k
        cmask = (cols == i).astype(l.dtype)
        ci = jnp.sum(l * cmask, axis=1)                      # (D,) = L[:, i]
        lii = jnp.sum(jnp.where(rowvec == i, ci, 0.0))
        acc = jnp.dot(ci[None, :], x,
                      preferred_element_type=x.dtype)[0]
        bi = jnp.sum(jnp.where(rowvec[:, None] == i, b, 0.0), axis=0)
        xi = (bi - acc) / lii
        return x + jnp.where(rowvec[:, None] == i, xi[None, :], 0.0)

    return jax.lax.fori_loop(0, D, row_step, jnp.zeros_like(b))


def _kernel(diag_ref, lower_ref, rhs_ref, out_ref, Lrows, Ldiags, ys):
    """Single-program kernel: full factorize + solve for one trial.

    Scratch:
      Lrows  (N, BW, D, D) - off-diagonal factor blocks L[t, t-1..t-BW]
      Ldiags (N, D, D)     - diagonal factor blocks
      ys     (N, D)        - forward-substitution intermediates
    """
    N = diag_ref.shape[0]

    def fact_step(t, _):
        # L[t, t-j] for j = BW..1, then the diagonal block
        blocks = []
        for j in range(BW, 0, -1):
            M = jnp.where(t - j >= 0,
                          lower_ref[j - 1, jnp.maximum(t - j, 0)],
                          jnp.zeros((D, D), diag_ref.dtype))
            for k in range(j + 1, BW + 1):
                # L[t, t-k] @ L[t-j, t-j-(k-j)]^T; guard reads of
                # not-yet-written scratch rows (uninitialized VMEM)
                Ltk = blocks[BW - k]
                prev = jnp.where(t - j >= 0,
                                 Lrows[jnp.maximum(t - j, 0), BW - (k - j)],
                                 jnp.zeros((D, D), diag_ref.dtype))
                M = M - jnp.dot(Ltk, prev.T,
                                preferred_element_type=M.dtype)
            Ld_prev = jnp.where(t - j >= 0,
                                Ldiags[jnp.maximum(t - j, 0)],
                                jnp.eye(D, dtype=diag_ref.dtype))
            blocks.append(_trsm_lower(Ld_prev, M.T).T)
        S = diag_ref[t]
        for k in range(1, BW + 1):
            Lk = blocks[BW - k]
            S = S - jnp.dot(Lk, Lk.T, preferred_element_type=S.dtype)
        Ld = _chol64(S)
        Ldiags[t] = Ld
        for j in range(1, BW + 1):
            Lrows[t, BW - j] = blocks[BW - j]
        # forward substitution y[t] = Ld^{-1} (rhs[t] - sum L[t,t-k] y[t-k])
        s = rhs_ref[t]
        for k in range(1, BW + 1):
            yk = jnp.where(t - k >= 0, ys[jnp.maximum(t - k, 0)],
                           jnp.zeros((D,), diag_ref.dtype))
            s = s - jnp.dot(blocks[BW - k], yk[:, None],
                            preferred_element_type=s.dtype)[:, 0]
        ys[t] = _trsm_lower(Ld, s[:, None])[:, 0]
        return 0

    jax.lax.fori_loop(0, N, fact_step, 0)

    def back_step(k, _):
        t = N - 1 - k
        s = ys[t]
        for j in range(1, BW + 1):
            # x[t] -= L[t+j, t]^T x[t+j]
            Lj = jnp.where(t + j <= N - 1,
                           Lrows[jnp.minimum(t + j, N - 1), BW - j],
                           jnp.zeros((D, D), diag_ref.dtype))
            xj = jnp.where(t + j <= N - 1,
                           out_ref[jnp.minimum(t + j, N - 1)],
                           jnp.zeros((D,), diag_ref.dtype))
            s = s - jnp.dot(Lj.T, xj[:, None],
                            preferred_element_type=s.dtype)[:, 0]
        out_ref[t] = _trsm_lower_t(Ldiags[t], s[:, None])[:, 0]
        return 0

    jax.lax.fori_loop(0, N, back_step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_banded_solve(H: banded.BlockBanded, b: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Solve H x = b (SPD block-banded, bandwidth <= 3) in one fused kernel.

    Blocks are zero-padded to 64 with identity diagonal on the pad so the
    padded system stays SPD; the pad components of x are discarded.
    """
    N, d = H.diag.shape[0], H.diag.shape[-1]
    dtype = H.diag.dtype
    pad = D - d
    assert pad >= 0
    # The kernel holds every frame's factor blocks in VMEM scratch:
    # (N, BW+1, 64, 64) f32 ~ N * 64 KiB, against the ~16 MiB scoped VMEM
    # budget. Beyond ~N=160 the compile fails with a scoped-vmem OOM
    # (measured at N=256 on v5e); long trials belong to the scan/CR paths
    # (or a future HBM-streaming variant that keeps only a BW-row window
    # resident).
    assert N <= 160, (
        f"pallas_banded_solve: N={N} exceeds the VMEM-resident limit "
        "(~160 frames); use linear_solver='scan' or 'cr' for long trials")
    eyepad = np.zeros((D, D), np.float64)
    eyepad[d:, d:] = np.eye(pad)
    diag = jnp.pad(H.diag, ((0, 0), (0, pad), (0, pad))) \
        + jnp.asarray(eyepad, dtype)[None]
    lower = jnp.pad(H.lower, ((0, 0), (0, 0), (0, pad), (0, pad)))
    rhs = jnp.pad(b, ((0, 0), (0, pad)))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N, D), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N, BW, D, D), dtype),
            pltpu.VMEM((N, D, D), dtype),
            pltpu.VMEM((N, D), dtype),
        ],
        interpret=interpret,
    )(diag, lower, rhs)
    return out[:, :d]
