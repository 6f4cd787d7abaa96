"""Trust-region Levenberg-Marquardt driver over block-banded normal equations.

Replaces IPOPT's interior-point iteration (reference ``acinoset_opt.py:611``)
with a jit-compiled, vmap-batchable damped Gauss-Newton loop:

  solve (H + lam * diag(scale)) dq = -g,  accept iff cost decreases.

``normal_fn(q) -> (g, H)`` supplies the gradient and a PSD block-banded
curvature approximation; ``cost_fn(q)`` the true objective (robust losses,
-log GMM, penalties — not the quadratic model), so acceptance is exact.
A failed Cholesky yields NaNs, the trial point is rejected and the damping
increases — no special-casing needed.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import banded


class LMConfig(NamedTuple):
    max_iters: int = 100
    lam0: float = 1e-2
    lam_min: float = 1e-12
    lam_max: float = 1e10
    ftol: float = 1e-8   # relative cost decrease
    xtol: float = 0.0    # max |dq|
    # Marquardt damping floor: lam multiplies max(diag(H), diag_floor).
    # A scalar 1e-8 suffices when every coordinate carries real curvature;
    # pass an (N, d) array to bound steps in *flat* directions (e.g. the
    # kinetic stage's welded-joint coordinates, whose curvature is ~0.2
    # while gradients reach ~200 — pure relative damping then allows
    # ~70 rad trial steps whose true cost explodes, and LM stalls
    # rejecting them; see KineticFTE.make_solver).
    diag_floor: object = 1e-8
    # trust-region cap on the trial step's inf-norm. The GN model of a
    # rotation-heavy cost is only valid for fractions of a radian; in flat
    # directions (zero model-error weight AND weak measurement curvature —
    # e.g. limb-roll coordinates) relative damping cannot bound the step,
    # and an exploding trial point burns the whole iteration budget on
    # reject/re-damp cycles. inf = uncapped (kinematic stage: every
    # coordinate carries curvature).
    step_cap: float = float("inf")
    # "cr": block cyclic reduction — O(log N) parallel depth; with
    # factorization-grade precision + one step of iterative refinement it
    # matches the scan to ~7e-4 at production shape while running ~20%
    # faster on the v5e (docs/artifacts/linsolve_bench.json), so it is the
    # production default. "scan": sequential banded Cholesky over time
    # (lowest FLOPs, bit-stable reference; the batch axis provides the
    # parallelism).
    # The production surface is exactly these two backends (VERDICT r4
    # ask #6). The experimental Pallas streaming factorization
    # (ops.pallas_banded) is numerically sound since the round-5 full-f32
    # MXU fix (rel err ~7e-4 at production conditioning,
    # linsolve_bench.json) but measured slower than both at every
    # production shape, so it is NOT selectable here — it stays available
    # to the linsolve benchmark and direct callers via _scaled_solve /
    # ops.pallas_banded.solve.
    linear_solver: str = "cr"


def _check_production_backend(name: str) -> None:
    """Called by every LM driver at trace time."""
    if name not in ("scan", "cr"):
        raise ValueError(
            f"linear_solver={name!r}: the production backends are 'scan' "
            "and 'cr' (the experimental Pallas kernel is bench-only — "
            "ops.pallas_banded)")


class LMState(NamedTuple):
    q: jnp.ndarray       # (N, d)
    cost: jnp.ndarray    # scalar
    lam: jnp.ndarray     # scalar damping
    nu: jnp.ndarray      # Nielsen reject growth factor
    it: jnp.ndarray      # iteration counter
    done: jnp.ndarray    # convergence flag
    n_accepted: jnp.ndarray


def _scaled_solve(g, H: banded.BlockBanded, lam, diag_floor,
                  linear_solver: str = "cr"):
    """Solve (H + lam * diag(H)) dq = -g via symmetric Jacobi scaling.

    Scaling by S = diag(H)^{-1/2} both implements Marquardt's diagonal
    damping and normalizes the system's wildly mixed scales (the
    constant-acceleration weights reach ~1e7 while measurement curvature is
    O(1)), which keeps the banded Cholesky accurate in float32 on TPU.
    """
    d = jnp.maximum(jnp.diagonal(H.diag, axis1=-2, axis2=-1), diag_floor)
    s = jax.lax.rsqrt(d)                                  # (N, d)
    Hs_diag = H.diag * s[:, :, None] * s[:, None, :]
    B = H.lower.shape[0]
    N = H.diag.shape[0]
    Hs_lower = H.lower
    for k in range(1, B + 1):
        sk = jnp.zeros_like(s).at[: N - k].set(s[k:])     # s[t+k] rows
        Hs_lower = Hs_lower.at[k - 1].set(
            H.lower[k - 1] * sk[:, :, None] * s[:, None, :])
    eye = jnp.eye(H.diag.shape[-1], dtype=H.diag.dtype)
    Hs = banded.BlockBanded(Hs_diag + lam * eye[None], Hs_lower)
    if linear_solver == "pallas":
        from ..ops import pallas_banded
        # collective-vmap entry: when this solver is vmapped over trials
        # (the production path), the whole batch enters one streaming
        # kernel and the eliminations vectorize across trials
        y = pallas_banded.solve(Hs.diag, Hs.lower, -(g * s))
    else:
        solve = banded.cr_solve if linear_solver == "cr" else banded.solve
        y = solve(Hs, -(g * s))
    return y * s


def _lm_step(s: LMState, cost_fn, normal_fn, config: LMConfig,
             guard_fn=None, guard_cap=None) -> LMState:
    """One damped-GN attempt with Nielsen's gain-ratio damping update.

    ``guard_fn(q) -> scalar`` with ``guard_cap``: an additional acceptance
    criterion in the spirit of IPOPT's filter line search — a trial point
    whose guard value exceeds the cap is rejected even if the total cost
    decreased. The kinetic stage guards the measurement+prior cost: its
    EOM term dominates the objective by ~1e3-1e5, and with a saturating
    robust loss a dynamics-feasible trajectory that IGNORES the data can
    otherwise cost less than the true one (round-2 measured runaway:
    MPE 0.3-0.9 m with the EOM at its floor).
    """
    g, H = normal_fn(s.q)
    _check_production_backend(config.linear_solver)
    dq = _scaled_solve(g, H, s.lam, config.diag_floor, config.linear_solver)
    if config.step_cap != float("inf"):
        dq = dq * jnp.minimum(
            1.0, config.step_cap / jnp.maximum(jnp.max(jnp.abs(dq)), 1e-30))
    qn = s.q + dq
    cn = cost_fn(qn)
    # predicted decrease under the quadratic model (H PSD => positive)
    pred = -(jnp.sum(g * dq) + 0.5 * jnp.sum(dq * banded.matvec(H, dq)))
    rho = (s.cost - cn) / jnp.maximum(pred, 1e-30)
    improved = cn < s.cost  # False for NaN -> reject
    if guard_fn is not None:
        improved = jnp.logical_and(improved, guard_fn(qn) <= guard_cap)
    accept = jnp.logical_and(improved, jnp.logical_not(s.done))
    q_new = jnp.where(accept, qn, s.q)
    cost_new = jnp.where(accept, cn, s.cost)
    shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0)**3)
    lam_acc = jnp.clip(s.lam * shrink, config.lam_min, config.lam_max)
    lam_rej = jnp.minimum(s.lam * s.nu, config.lam_max)
    lam_new = jnp.where(accept, lam_acc, lam_rej)
    nu_new = jnp.where(accept, jnp.asarray(2.0, s.nu.dtype),
                       jnp.minimum(s.nu * 2.0, 1e8))
    lam_new = jnp.where(s.done, s.lam, lam_new)
    # ftol below the dtype's resolution is unreachable (in f32 the cost
    # cannot resolve relative changes under ~1.2e-7, so lanes would burn
    # max_iters making sub-epsilon "progress"): floor it at 8 eps.
    ftol_eff = jnp.maximum(
        jnp.asarray(config.ftol, s.cost.dtype),
        8.0 * jnp.finfo(s.cost.dtype).eps)
    rel_drop = (s.cost - cn) / jnp.maximum(jnp.abs(s.cost), 1e-30)
    small_step = jnp.max(jnp.abs(dq)) <= config.xtol
    converged = jnp.logical_and(
        accept, jnp.logical_or(rel_drop < ftol_eff, small_step))
    # no-progress stall: the quadratic model itself predicts a negligible
    # decrease and the step still got rejected — no descent available
    tiny_pred = pred <= ftol_eff * jnp.maximum(jnp.abs(s.cost), 1e-30)
    converged = jnp.logical_or(
        converged, jnp.logical_and(jnp.logical_not(improved), tiny_pred))
    stalled = s.lam >= config.lam_max
    done_new = jnp.logical_or(s.done, jnp.logical_or(converged, stalled))
    return LMState(q=q_new, cost=cost_new, lam=lam_new, nu=nu_new,
                   it=s.it + 1, done=done_new,
                   n_accepted=s.n_accepted + accept.astype(jnp.int32))


def _init_state(cost_fn, q0, config: LMConfig) -> LMState:
    dtype = q0.dtype
    return LMState(q=q0, cost=cost_fn(q0),
                   lam=jnp.asarray(config.lam0, dtype),
                   nu=jnp.asarray(2.0, dtype), it=jnp.asarray(0),
                   done=jnp.asarray(False), n_accepted=jnp.asarray(0))


def lm_solve(cost_fn: Callable, normal_fn: Callable, q0: jnp.ndarray,
             config: LMConfig = LMConfig()) -> LMState:
    """Minimize cost_fn starting from q0 (N, d).

    Both callables must be jit-traceable pure functions of q.
    """
    state = _init_state(cost_fn, q0, config)

    def cond(s: LMState):
        return jnp.logical_and(s.it < config.max_iters,
                               jnp.logical_not(jnp.all(s.done)))

    return jax.lax.while_loop(
        cond, lambda s: _lm_step(s, cost_fn, normal_fn, config), state)


def lm_solve_annealed(cost_fn: Callable, normal_fn: Callable,
                      q0: jnp.ndarray,
                      stages: Tuple[Tuple[float, int], ...],
                      config: LMConfig = LMConfig(),
                      guard_fn: Callable = None,
                      guard_cap=None) -> LMState:
    """Graduated-non-convexity LM in a single while_loop.

    ``cost_fn(q, scale)`` / ``normal_fn(q, scale)`` take the annealing scale
    as a traced argument, so only ONE loop body is compiled for all stages
    (compile time matters: the body contains the full FK/projection Jacobian
    assembly). At a stage boundary the reference cost is re-evaluated on the
    new surface and the convergence flag cleared.
    """
    n_stages = len(stages)
    scales = jnp.asarray([s for s, _ in stages], q0.dtype)
    bounds = jnp.cumsum(jnp.asarray([it for _, it in stages]))
    total = int(sum(it for _, it in stages))
    last_stage_start = int(sum(it for _, it in stages[:-1]))

    s0 = _init_state(lambda q: cost_fn(q, scales[0]), q0, config)
    state = (s0, scales[0])

    def cond(carry):
        s, _ = carry
        final_done = jnp.logical_and(s.done, s.it >= last_stage_start)
        return jnp.logical_and(s.it < total, jnp.logical_not(final_done))

    def body(carry):
        s, prev_scale = carry
        idx = jnp.minimum(jnp.searchsorted(bounds, s.it, side="right"),
                          n_stages - 1)
        scale = scales[idx]
        changed = scale != prev_scale
        cost = jnp.where(changed, cost_fn(s.q, scale), s.cost)
        done = jnp.logical_and(s.done, jnp.logical_not(changed))
        # fresh damping state on each annealing surface
        lam = jnp.where(changed, jnp.asarray(config.lam0, s.lam.dtype), s.lam)
        nu = jnp.where(changed, jnp.asarray(2.0, s.nu.dtype), s.nu)
        s = s._replace(cost=cost, done=done, lam=lam, nu=nu)
        ns = _lm_step(s, lambda q: cost_fn(q, scale),
                      lambda q: normal_fn(q, scale), config,
                      guard_fn=guard_fn, guard_cap=guard_cap)
        # a stage that converged (or stalled) early fast-forwards to its
        # boundary so the next iteration enters the next stage; `done` must
        # be cleared with it, otherwise the loop condition would read
        # it >= last_stage_start && done and exit before the next stage runs
        ff = jnp.logical_and(ns.done, idx < n_stages - 1)
        ns = ns._replace(it=jnp.where(ff, bounds[idx], ns.it),
                         done=jnp.logical_and(ns.done,
                                              jnp.logical_not(ff)),
                         lam=jnp.where(ff, jnp.asarray(config.lam0,
                                                       ns.lam.dtype),
                                       ns.lam))
        return (ns, scale)

    final, _ = jax.lax.while_loop(cond, body, state)
    return final


class BorderedState(NamedTuple):
    q: jnp.ndarray       # (N, d)
    tau: jnp.ndarray     # (C,) border unknowns (per-camera shutter delays)
    cost: jnp.ndarray
    lam: jnp.ndarray
    nu: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    n_accepted: jnp.ndarray


def _bordered_solve(gq, H: banded.BlockBanded, gtau, Bmat, Htt, lam,
                    diag_floor):
    """Solve the bordered SPD system

        [[H, B], [B^T, diag(Htt)]] [dq; dtau] = -[gq; gtau]

    by Schur complement on the banded factor: one banded Cholesky, 1 + C
    right-hand sides, then a CxC dense solve. This is how the per-camera
    shutter delays join the trajectory as *first-class unknowns* without
    breaking the banded structure (reference: shutter_delay[C] is a free
    pyomo Var solved jointly, acinoset_misc.py:180-183).

    Shapes: gq (N, d), B (N, d, C), Htt (C,), gtau (C,).
    """
    d = jnp.maximum(jnp.diagonal(H.diag, axis1=-2, axis2=-1), diag_floor)
    s = jax.lax.rsqrt(d)
    st = jax.lax.rsqrt(jnp.maximum(Htt, diag_floor))
    Hs_diag = H.diag * s[:, :, None] * s[:, None, :]
    B = H.lower.shape[0]
    N = H.diag.shape[0]
    Hs_lower = H.lower
    for k in range(1, B + 1):
        sk = jnp.zeros_like(s).at[: N - k].set(s[k:])
        Hs_lower = Hs_lower.at[k - 1].set(
            H.lower[k - 1] * sk[:, :, None] * s[:, None, :])
    eye = jnp.eye(H.diag.shape[-1], dtype=H.diag.dtype)
    Hs = banded.BlockBanded(Hs_diag + lam * eye[None], Hs_lower)
    Bs = Bmat * s[:, :, None] * st[None, None, :]
    Htt_s = jnp.ones_like(Htt) + lam        # Htt * st^2 = 1 on the diagonal
    L = banded.cholesky(Hs)
    rhs = jnp.concatenate([-(gq * s)[:, :, None], Bs], axis=2)
    X = jax.vmap(lambda b: banded.solve_factored(L, b),
                 in_axes=2, out_axes=2)(rhs)
    y0 = X[..., 0]                           # (N, d)
    Y = X[..., 1:]                           # (N, d, C)
    S = jnp.diag(Htt_s) - jnp.einsum("ndc,ndk->ck", Bs, Y)
    rt = -(gtau * st) - jnp.einsum("ndc,nd->c", Bs, y0)
    Ls = jnp.linalg.cholesky(S)
    dts = jax.scipy.linalg.cho_solve((Ls, True), rt)
    dqs = y0 - jnp.einsum("ndc,c->nd", Y, dts)
    return dqs * s, dts * st


def lm_solve_bordered(cost_fn: Callable, normal_fn: Callable,
                      q0: jnp.ndarray, tau0: jnp.ndarray,
                      config: LMConfig = LMConfig()) -> BorderedState:
    """LM over the bordered state (q, tau).

    ``cost_fn(q, tau)`` scalar; ``normal_fn(q, tau) -> (gq, H, gtau, B,
    Htt)`` with H block-banded and (B, Htt) the border blocks. Pin a tau
    entry by giving it a huge Htt value (its step then scales to ~0).
    """
    dtype = q0.dtype
    s0 = BorderedState(
        q=q0, tau=tau0, cost=cost_fn(q0, tau0),
        lam=jnp.asarray(config.lam0, dtype), nu=jnp.asarray(2.0, dtype),
        it=jnp.asarray(0), done=jnp.asarray(False),
        n_accepted=jnp.asarray(0))

    def step(s: BorderedState) -> BorderedState:
        gq, H, gtau, Bmat, Htt = normal_fn(s.q, s.tau)
        dq, dtau = _bordered_solve(gq, H, gtau, Bmat, Htt, s.lam,
                                   config.diag_floor)
        qn = s.q + dq
        taun = s.tau + dtau
        cn = cost_fn(qn, taun)
        pred = -(jnp.sum(gq * dq) + jnp.sum(gtau * dtau)
                 + 0.5 * (jnp.sum(dq * banded.matvec(H, dq))
                          + 2.0 * jnp.einsum("nd,ndc,c->", dq, Bmat, dtau)
                          + jnp.sum(Htt * dtau * dtau)))
        rho = (s.cost - cn) / jnp.maximum(pred, 1e-30)
        improved = cn < s.cost
        accept = jnp.logical_and(improved, jnp.logical_not(s.done))
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0)**3)
        lam_new = jnp.where(
            accept, jnp.clip(s.lam * shrink, config.lam_min, config.lam_max),
            jnp.minimum(s.lam * s.nu, config.lam_max))
        nu_new = jnp.where(accept, jnp.asarray(2.0, s.nu.dtype),
                           jnp.minimum(s.nu * 2.0, 1e8))
        ftol_eff = jnp.maximum(jnp.asarray(config.ftol, s.cost.dtype),
                               8.0 * jnp.finfo(s.cost.dtype).eps)
        rel_drop = (s.cost - cn) / jnp.maximum(jnp.abs(s.cost), 1e-30)
        converged = jnp.logical_and(accept, rel_drop < ftol_eff)
        tiny_pred = pred <= ftol_eff * jnp.maximum(jnp.abs(s.cost), 1e-30)
        converged = jnp.logical_or(
            converged,
            jnp.logical_and(jnp.logical_not(improved), tiny_pred))
        stalled = s.lam >= config.lam_max
        return BorderedState(
            q=jnp.where(accept, qn, s.q),
            tau=jnp.where(accept, taun, s.tau),
            cost=jnp.where(accept, cn, s.cost),
            lam=jnp.where(s.done, s.lam, lam_new), nu=nu_new, it=s.it + 1,
            done=jnp.logical_or(s.done,
                                jnp.logical_or(converged, stalled)),
            n_accepted=s.n_accepted + accept.astype(jnp.int32))

    def cond(s: BorderedState):
        return jnp.logical_and(s.it < config.max_iters,
                               jnp.logical_not(s.done))

    return jax.lax.while_loop(cond, step, s0)


def lm_solve_scan(cost_fn: Callable, normal_fn: Callable, q0: jnp.ndarray,
                  config: LMConfig = LMConfig()) -> Tuple[LMState, jnp.ndarray]:
    """Fixed-iteration variant (scan): uniform work per step, best under vmap
    when batch elements converge at similar rates. Also returns the cost trace.
    """
    state = _init_state(cost_fn, q0, config)

    def step(s, _):
        ns = _lm_step(s, cost_fn, normal_fn, config)
        return ns, ns.cost

    final, trace = jax.lax.scan(step, state, None, length=config.max_iters)
    return final, trace


def lm_solve_annealed_scan(cost_fn: Callable, normal_fn: Callable,
                           q0: jnp.ndarray,
                           stages: Tuple[Tuple[float, int], ...],
                           config: LMConfig = LMConfig(),
                           guard_fn: Callable = None,
                           guard_cap=None) -> LMState:
    """Graduated-non-convexity LM as a fixed-length scan.

    Result-equivalent to :func:`lm_solve_annealed` when lanes use their full
    per-stage budgets (converged lanes freeze via the ``done`` gate until the
    next stage boundary instead of fast-forwarding). Measured on the v5e:
    the plain fixed-iteration scan compiles ~8x faster than its while_loop
    twin, but for THIS annealed body the stage-boundary cost re-evaluation
    keeps compile time equal and adds ~10% runtime — so the while driver
    remains the default; this variant exists for deterministic fixed-cost
    execution (e.g. cost-trace profiling, strict step-count reproducibility
    across batch compositions)."""
    n_stages = len(stages)
    scales = jnp.asarray([s for s, _ in stages], q0.dtype)
    bounds = jnp.cumsum(jnp.asarray([it for _, it in stages]))
    total = int(sum(it for _, it in stages))

    s0 = _init_state(lambda q: cost_fn(q, scales[0]), q0, config)

    def body(carry, _):
        s, prev_scale = carry
        idx = jnp.minimum(jnp.searchsorted(bounds, s.it, side="right"),
                          n_stages - 1)
        scale = scales[idx]
        changed = scale != prev_scale
        cost = jnp.where(changed, cost_fn(s.q, scale), s.cost)
        done = jnp.logical_and(s.done, jnp.logical_not(changed))
        lam = jnp.where(changed, jnp.asarray(config.lam0, s.lam.dtype),
                        s.lam)
        nu = jnp.where(changed, jnp.asarray(2.0, s.nu.dtype), s.nu)
        s = s._replace(cost=cost, done=done, lam=lam, nu=nu)
        ns = _lm_step(s, lambda q: cost_fn(q, scale),
                      lambda q: normal_fn(q, scale), config,
                      guard_fn=guard_fn, guard_cap=guard_cap)
        return (ns, scale), None

    (final, _), _ = jax.lax.scan(body, (s0, scales[0]), None, length=total)
    return final
