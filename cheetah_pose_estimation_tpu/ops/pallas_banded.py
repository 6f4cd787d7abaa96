"""Batched streaming block-banded Cholesky solve as Pallas TPU kernels.

TPU-native factorization for the trajectory normal equations (the custom
kernel the SURVEY §7 build plan calls for): every LM iteration solves B
independent SPD block-banded systems (bandwidth 3 from the constant-
acceleration stencil, 54-dim blocks zero-padded to 64 lanes). The XLA path
(``ops.banded``) lowers to a ``lax.scan`` of small dense ops; this kernel
pipelines the same factorization through two Pallas calls designed around
the hardware:

* **batch-vectorized elimination** — the sequential masked Cholesky /
  triangular-solve steps (the latency bottleneck: 64 data-dependent column
  eliminations per frame) process all B trials' blocks at once as
  (B, 64, 64) VPU ops, so the elimination depth is paid once per frame for
  the whole batch instead of once per trial;
* **frame-streamed factors** — the grid walks frames sequentially (TPU
  grid order guarantee), keeping only a bandwidth-deep rolling window of
  factor blocks in VMEM scratch and streaming the full factor rows to HBM
  through the output BlockSpecs for the backward pass. VMEM use is O(BW^2
  * B * 64^2) — independent of N, so trial length is bounded by HBM, not
  by the ~160-frame VMEM cap of the round-2 fully-resident design;
* **MXU block products** — the inter-block updates are batched 64x64
  matmuls via ``dot_general`` with a leading batch dimension.

Forward pass (grid t = 0..N-1): factor frame t's row, forward-substitute
y[t]. Backward pass (grid i = 0..N-1, t = N-1-i): x[t] from the streamed
factors. The reference's counterpart is IPOPT's MA97 multifrontal LDL^T
(``acinoset_opt.py:611-617``); parallel-in-time alternatives (block cyclic
reduction) live in ``ops.banded.cr_solve``.

Layout (matches ops.banded.BlockBanded): diag (N, d, d), lower
(BW, N, d, d) with lower[k-1, t] = H[t+k, t], rhs (N, d) -> x (N, d);
batched variants carry a leading B axis on diag/lower/rhs.
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
BW = 3          # bandwidth (constant-acceleration stencil)


def _bmm_t(a, b):
    """(B, D, D) @ (B, D, D)^T batched matmul on the MXU.

    precision=HIGHEST: the MXU's default f32 path truncates operands to
    bf16 (8-bit mantissa, ~4e-3 relative per product); accumulated through
    N frames of elimination that cost the round-4 kernel 6-8% solve error
    at production conditioning (linsolve_bench.json). The 3-pass f32
    decomposition is mandatory for a factorization."""
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST)


def _bmv(a, v):
    """(B, D, D) @ (B, D) batched matvec (Mosaic-supported form: lhs/rhs
    contracting dims last, vector-like rhs). Full f32 precision — see
    _bmm_t."""
    return jax.lax.dot_general(
        a, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST)


def _chol_b(a):
    """Batched Cholesky of (B, D, D) SPD tiles by masked right-looking
    elimination: 64 sequential column steps, each a full-tile VPU op over
    the whole batch (Mosaic has no value-level dynamic_slice, so column
    extraction uses broadcasted-iota masks)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    rowvec = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)[:, 0]

    def col_step(j, carry):
        a_c, l_c = carry
        colmask = (cols == j).astype(a_c.dtype)               # (D, D)
        col = jnp.sum(a_c * colmask[None], axis=2)            # (B, D)
        ajj = jnp.sum(jnp.where(rowvec[None] == j, col, 0.0),
                      axis=1)                                 # (B,)
        # 1/sqrt, NOT lax.rsqrt: Mosaic lowers rsqrt to the VPU's fast
        # approximation (~1e-3 relative), poison for a Cholesky pivot
        inv = 1.0 / jnp.sqrt(jnp.maximum(ajj, 1e-30))         # (B,)
        colL = jnp.where(rowvec[None] >= j, col * inv[:, None], 0.0)
        l_c = l_c + colL[:, :, None] * colmask[None]
        a_c = a_c - colL[:, :, None] * colL[:, None, :]
        return a_c, l_c

    _, l = jax.lax.fori_loop(0, D, col_step, (a, jnp.zeros_like(a)))
    return l


def _trsm_b(l, b):
    """Solve L X = B batched (L (B, D, D) lower-triangular, B (B, D, K)):
    64 masked forward-substitution row steps over the whole batch."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    rowvec = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)[:, 0]

    def row_step(i, x):
        rmask = (rows == i).astype(l.dtype)                   # (D, D)
        li = jnp.sum(l * rmask[None], axis=1)                 # (B, D) L[i,:]
        lii = jnp.sum(jnp.where(rowvec[None] == i, li, 0.0), axis=1)
        acc = jnp.sum(li[:, :, None] * x, axis=1)             # (B, K)
        bi = jnp.sum(jnp.where(rowvec[None, :, None] == i, b, 0.0), axis=1)
        xi = (bi - acc) / lii[:, None]
        return x + jnp.where(rowvec[None, :, None] == i,
                             xi[:, None, :], 0.0)

    return jax.lax.fori_loop(0, D, row_step, jnp.zeros_like(b))


def _trsm_t_b(l, b):
    """Solve L^T X = B batched: masked backward substitution."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    rowvec = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)[:, 0]

    def row_step(k, x):
        i = D - 1 - k
        cmask = (cols == i).astype(l.dtype)
        ci = jnp.sum(l * cmask[None], axis=2)                 # (B, D) L[:,i]
        lii = jnp.sum(jnp.where(rowvec[None] == i, ci, 0.0), axis=1)
        acc = jnp.sum(ci[:, :, None] * x, axis=1)             # (B, K)
        bi = jnp.sum(jnp.where(rowvec[None, :, None] == i, b, 0.0), axis=1)
        xi = (bi - acc) / lii[:, None]
        return x + jnp.where(rowvec[None, :, None] == i,
                             xi[:, None, :], 0.0)

    return jax.lax.fori_loop(0, D, row_step, jnp.zeros_like(b))


def _fwd_kernel(diag_ref, l1_ref, l2_ref, l3_ref, rhs_ref,
                lrow1_ref, lrow2_ref, lrow3_ref, ldiag_ref, y_ref,
                lwin1, lwin2, lwin3, ldwin, ywin):
    """Forward factorization + substitution for frame t = program_id(0).

    Block inputs at t: diag (1, B, D, D); lj = H[t, t-j] (masked t < j);
    rhs (1, B, D). Outputs at t: lrowj (1, B, D, D) per band, ldiag
    (1, B, D, D), y (1, B, D). Rolling scratch windows over the last BW
    frames, one 4-D buffer per band — every ref stays <= 4-D (5-D
    BlockSpecs/scratch were the round-3 Mosaic-compile failure):
    lwinj (BW, B, D, D), ldwin (BW, B, D, D), ywin (BW, B, D),
    slot s(t) = t mod BW.
    """
    t = pl.program_id(0)
    B = diag_ref.shape[1]
    dtype = diag_ref.dtype
    lrefs = (l1_ref, l2_ref, l3_ref)
    lrows = (lrow1_ref, lrow2_ref, lrow3_ref)
    lwins = (lwin1, lwin2, lwin3)

    # L[t, t-j] for j = BW..1 (trailing blocks first, as each depends on
    # the later ones through the cross terms)
    blocks = [None] * (BW + 1)          # blocks[j] = L[t, t-j]
    for j in range(BW, 0, -1):
        valid_j = (t >= j).astype(dtype)
        M = lrefs[j - 1][0] * valid_j
        for k in range(j + 1, BW + 1):
            # M -= L[t, t-k] @ L[t-j, (t-j)-(k-j)]^T   (row t-j, band k-j)
            # (scratch slots of virtual frames are UNWRITTEN - mask with
            # where, never by multiplication: NaN * 0 = NaN)
            prev = jnp.where(t >= j, lwins[(k - j) - 1][(t - j) % BW], 0.0)
            M = M - _bmm_t(blocks[k], prev)
        # Ld of frame t-j: identity on masked/virtual frames keeps the
        # triangular solve well-defined with a zero result
        eye = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (B, D, D))
        Ld_prev = jnp.where(valid_j > 0, ldwin[(t - j) % BW], eye)
        # L[t, t-j] = M Ld_prev^{-T}  ->  solve Ld_prev X = M^T, X = L^T
        blocks[j] = _trsm_b(Ld_prev, M.transpose(0, 2, 1)).transpose(0, 2, 1)
    S = diag_ref[0]
    for k in range(1, BW + 1):
        S = S - _bmm_t(blocks[k], blocks[k])
    Ld = _chol_b(S)

    # forward substitution y[t] = Ld^{-1} (rhs[t] - sum_k L[t,t-k] y[t-k])
    s = rhs_ref[0]
    for k in range(1, BW + 1):
        yk = jnp.where(t >= k, ywin[(t - k) % BW], 0.0)
        s = s - _bmv(blocks[k], yk)
    y = _trsm_b(Ld, s[:, :, None])[:, :, 0]

    # stream to HBM for the backward pass + refresh the rolling window
    for j in range(1, BW + 1):
        lrows[j - 1][0] = blocks[j]
        lwins[j - 1][t % BW] = blocks[j]
    ldiag_ref[0] = Ld
    ldwin[t % BW] = Ld
    y_ref[0] = y
    ywin[t % BW] = y


def _bwd_kernel(lr1_ref, lr2_ref, lr3_ref, ldiag_ref, y_ref, x_ref, xwin):
    """Backward substitution for frame t = N-1-program_id(0):
    x[t] = Ldiag[t]^{-T} (y[t] - sum_j L[t+j, t]^T x[t+j]).

    Block inputs: lrj (1, B, D, D) = L[t+j, t] from the per-band forward
    outputs (clamped reads, masked t+j > N-1); xwin (BW, B, D) rolling
    window of the last BW solved frames.
    """
    i = pl.program_id(0)
    N = pl.num_programs(0)
    t = N - 1 - i
    dtype = y_ref.dtype
    lrefs = (lr1_ref, lr2_ref, lr3_ref)

    s = y_ref[0]
    for j in range(1, BW + 1):
        valid = (t + j <= N - 1).astype(dtype)
        Lj = lrefs[j - 1][0] * valid
        xj = jnp.where(t + j <= N - 1, xwin[(t + j) % BW], 0.0)
        # s -= L[t+j, t]^T x[t+j]  (explicit transpose: Mosaic requires
        # the contracting dim to be the last dim of both operands)
        s = s - _bmv(Lj.transpose(0, 2, 1), xj)
    x = _trsm_t_b(ldiag_ref[0], s[:, :, None])[:, :, 0]
    x_ref[0] = x
    xwin[t % BW] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_banded_solve_batched(diag: jnp.ndarray, lower: jnp.ndarray,
                                b: jnp.ndarray,
                                interpret: bool = False) -> jnp.ndarray:
    """Solve B independent SPD block-banded systems in two fused kernels.

    diag (B, N, d, d), lower (B, BW', N, d, d) with
    lower[i, k-1, t] = H[t+k, t] of trial i (BW' <= 3), b (B, N, d)
    -> x (B, N, d). Blocks are zero-padded to 64 lanes with an identity
    pad diagonal so the padded system stays SPD.
    """
    Bt, N, d = diag.shape[0], diag.shape[1], diag.shape[-1]
    bw_in = lower.shape[1]
    dtype = diag.dtype
    pad = D - d
    assert pad >= 0 and bw_in <= BW
    eyepad = np.zeros((D, D), np.float64)
    eyepad[d:, d:] = np.eye(pad)
    diag_p = jnp.pad(diag, ((0, 0), (0, 0), (0, pad), (0, pad))) \
        + jnp.asarray(eyepad, dtype)[None, None]
    lower_p = jnp.pad(lower, ((0, 0), (0, BW - bw_in), (0, 0),
                              (0, pad), (0, pad)))
    rhs = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))

    # frame-major layout for the frame-walking grid: (N, B, ...)
    diag_t = diag_p.transpose(1, 0, 2, 3)                  # (N, B, D, D)
    lower_t = lower_p.transpose(1, 2, 0, 3, 4)             # (BW, N, B, D, D)
    rhs_t = rhs.transpose(1, 0, 2)                         # (N, B, D)

    def lspec(j):
        # lj block at grid step t reads lower[j-1, t-j] = H[t, t-j]
        # (clamped at the left edge; the kernel masks t < j)
        return pl.BlockSpec((1, Bt, D, D),
                            lambda t, j=j: (jnp.maximum(t - j, 0), 0, 0, 0),
                            memory_space=pltpu.VMEM)

    lrow1, lrow2, lrow3, ldiag, ys = pl.pallas_call(
        _fwd_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, Bt, D, D), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            lspec(1), lspec(2), lspec(3),
            pl.BlockSpec((1, Bt, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, D, D), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, D, D), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, D, D), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, D, D), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bt, D, D), dtype),
            jax.ShapeDtypeStruct((N, Bt, D, D), dtype),
            jax.ShapeDtypeStruct((N, Bt, D, D), dtype),
            jax.ShapeDtypeStruct((N, Bt, D, D), dtype),
            jax.ShapeDtypeStruct((N, Bt, D), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((BW, Bt, D, D), dtype),
            pltpu.VMEM((BW, Bt, D, D), dtype),
            pltpu.VMEM((BW, Bt, D, D), dtype),
            pltpu.VMEM((BW, Bt, D, D), dtype),
            pltpu.VMEM((BW, Bt, D), dtype),
        ],
        interpret=interpret,
    )(diag_t, lower_t[0], lower_t[1], lower_t[2], rhs_t)

    def lrspec(j):
        # lrj block at grid step i reads lrowj[t+j] = L[t+j, t], t = N-1-i
        # (clamped at the right edge; the kernel masks t+j > N-1)
        return pl.BlockSpec(
            (1, Bt, D, D),
            lambda i, j=j: (jnp.minimum(N - 1 - i + j, N - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)

    x = pl.pallas_call(
        _bwd_kernel,
        grid=(N,),
        in_specs=[
            lrspec(1), lrspec(2), lrspec(3),
            pl.BlockSpec((1, Bt, D, D), lambda i: (N - 1 - i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, D), lambda i: (N - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Bt, D), lambda i: (N - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bt, D), dtype),
        scratch_shapes=[pltpu.VMEM((BW, Bt, D), dtype)],
        interpret=interpret,
    )(lrow1, lrow2, lrow3, ldiag, ys)

    return x.transpose(1, 0, 2)[:, :, :d]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_banded_solve(H: banded.BlockBanded, b: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Single-trial wrapper: solve H x = b (SPD block-banded, bandwidth
    <= 3). Kept for API parity with ops.banded; the batched entry point
    is where the kernel's elimination vectorization pays."""
    return pallas_banded_solve_batched(
        H.diag[None], H.lower[None], b[None], interpret=interpret)[0]


# VMEM scratch grows linearly with the in-kernel batch (~0.6 MB/trial of
# windows + streamed blocks) plus the f32 3-pass matmul working set; at 16
# trials the full-precision kernel overflows the 16 MB scoped-vmem budget
# (measured 17.4 MB on the v5e), so chunks are capped at 8.
MAX_KERNEL_BATCH = 8


def _solve_chunked(diag, lower, rhs):
    interp = jax.default_backend() != "tpu"
    B = diag.shape[0]
    # Mosaic relayout of sub-sublane batched reductions ((1, 64) -> (1,))
    # is unimplemented ("Offset change"): pad small batches to the 8-wide
    # VPU sublane and discard the extra lanes
    if B < 8 and not interp:
        reps = -(-8 // B)
        pad = jax.tree.map(lambda x: jnp.concatenate([x] * reps)[:8],
                           (diag, lower, rhs))
        return pallas_banded_solve_batched(*pad, interpret=interp)[:B]
    if B <= MAX_KERNEL_BATCH:
        return pallas_banded_solve_batched(diag, lower, rhs,
                                           interpret=interp)
    outs = [pallas_banded_solve_batched(
        diag[i:i + MAX_KERNEL_BATCH], lower[i:i + MAX_KERNEL_BATCH],
        rhs[i:i + MAX_KERNEL_BATCH], interpret=interp)
        for i in range(0, B, MAX_KERNEL_BATCH)]
    return jnp.concatenate(outs)


@jax.custom_batching.custom_vmap
def solve(diag: jnp.ndarray, lower: jnp.ndarray,
          rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve one SPD block-banded system H x = rhs with the streaming
    kernel — with a **collective vmap rule**: under ``jax.vmap`` (the LM
    drivers vmap whole solvers over trials) the entire batch enters ONE
    kernel call, so the sequential eliminations vectorize across trials
    instead of replaying per trial through a prepended grid axis (the
    failure mode that made the round-2 kernel slowest-of-three).

    diag (N, d, d), lower (BW, N, d, d), rhs (N, d) -> x (N, d).
    """
    return _solve_chunked(diag[None], lower[None], rhs[None])[0]


@solve.def_vmap
def _solve_vmap_rule(axis_size, in_batched, diag, lower, rhs):
    db, lb, rb = in_batched

    def bcast(x, is_b):
        return x if is_b else jnp.broadcast_to(x, (axis_size,) + x.shape)

    out = _solve_chunked(bcast(diag, db), bcast(lower, lb), bcast(rhs, rb))
    return out, True
