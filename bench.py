#!/usr/bin/env python
"""Benchmark: batched full monocular reconstruction pipeline on one chip.

Baseline (BASELINE.md, data/test_set/dataset_results.csv): per trial the
reference spends 20.9 s (default kinematic) + 725.6 s (physics-based) of
IPOPT+MA97 CPU time — 746.5 s/trial for the monocular pipeline. Here the 10
test trials are padded, stacked, and each stage solves as ONE vmapped batch
on the accelerator (float32 throughout — every factorization is
Jacobi-equilibrated): default kinematic FTE -> host-side contact detection ->
physics-based FTE with per-frame torque/GRF elimination. Prints a single
JSON line:

  {"metric": ..., "value": trials/min, "unit": "trials/min", "vs_baseline": x}

vs_baseline is the throughput ratio against the reference's
60 / 746.5 = 0.0804 trials/min. If the physics stage fails on the current
backend the script falls back to the kinematic-only metric (vs 20.9 s).
"""
import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from cheetah_pose_estimation_tpu.utils.device import enable_compile_cache

enable_compile_cache()

BASELINE_DEFAULT_S = 20.9
BASELINE_PHYSICS_S = 725.6


def linsolve_bench(out_path="docs/artifacts/linsolve_bench.json"):
    """Compare the three banded linear solvers (scan / cyclic reduction /
    fused Pallas kernel) on production-shape damped normal systems
    (B=10 trials x N=64 frames x 54-dim blocks, f32), as solved inside every
    LM iteration. Writes a JSON artifact and prints per-method ms."""
    from cheetah_pose_estimation_tpu.models import params as P
    from cheetah_pose_estimation_tpu.parallel import batch as pbatch
    from cheetah_pose_estimation_tpu.pipeline import bench_lib
    from cheetah_pose_estimation_tpu.solver import gn
    from cheetah_pose_estimation_tpu.solver import kinematic as kin

    subject = P.get_subject("acinoset")

    def bench_shape(B, N, tag):
        batched, q0b, _, _ = bench_lib.build_batch(
            max_trials=B, n_frames=N)
        fte = kin.KinematicFTE(kin.KinematicConfig(), subject)

        @jax.jit
        def normals(qb, datab):
            return jax.vmap(lambda q, d: fte._normal(q, d, 1.0))(qb, datab)

        g, H = normals(q0b, batched)
        jax.block_until_ready((g, H))
        lam = jnp.asarray(1e-2, q0b.dtype)
        out = {}
        ref = None
        for method in ("scan", "cr", "pallas"):
            solve = jax.jit(jax.vmap(
                lambda gg, Hd, Hl: gn._scaled_solve(
                    gg, type(H)(Hd, Hl), lam, 1e-8, method)))
            try:
                dq = solve(g, H.diag, H.lower)
                dq.block_until_ready()
                reps = 10
                t0 = time.time()
                for _ in range(reps):
                    dq = solve(g, H.diag, H.lower)
                dq.block_until_ready()
                ms = (time.time() - t0) / reps * 1e3
                # correctness vs the scan reference
                if method == "scan":
                    ref = np.asarray(dq)
                    err = 0.0
                else:
                    err = float(np.max(np.abs(np.asarray(dq) - ref))
                                / max(np.max(np.abs(ref)), 1e-30))
                out[method] = {"ms": round(ms, 2), "rel_err_vs_scan": err}
                print(f"# linsolve[{tag}] {method}: {ms:.2f} ms  "
                      f"rel_err={err:.2e}", file=sys.stderr)
            except Exception as e:
                out[method] = {"error": repr(e)[:200]}
                print(f"# linsolve[{tag}] {method}: FAILED {e!r}",
                      file=sys.stderr)
        return {"shape": {"B": B, "N": N, "d": 54}, "results": out}

    cases = {"batched_production": bench_shape(10, 64, "B10xN64"),
             "long_trial_single": bench_shape(1, 256, "B1xN256")}
    import os
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump({"device": jax.devices()[0].platform, "cases": cases},
                  f, indent=1)
    best = min(v["ms"]
               for v in cases["batched_production"]["results"].values()
               if "ms" in v)
    print(json.dumps({"metric": "banded_solve_batched", "value": best,
                      "unit": "ms", "vs_baseline": 0}))


def main():
    if "--linsolve" in sys.argv:
        linsolve_bench()
        return
    from cheetah_pose_estimation_tpu.models import skeleton as sk
    from cheetah_pose_estimation_tpu.parallel import batch as pbatch
    from cheetah_pose_estimation_tpu.pipeline import bench_lib
    from cheetah_pose_estimation_tpu.solver import kinematic as kin
    from cheetah_pose_estimation_tpu.solver import kinetic as kn

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=sys.stderr)

    dtype = jnp.float32
    n_frames = 64
    trajs = bench_lib.load_reference_trajectories(10)
    from cheetah_pose_estimation_tpu.models import params as P
    subject = P.get_subject("acinoset")
    datas, q0s, trials, fpss = [], [], [], []
    for i, (q_gt, name, fps) in enumerate(trajs):
        d, q0, tr = bench_lib.build_monocular_problem(q_gt, "acinoset", fps,
                                                      seed=i)
        datas.append(d)
        q0s.append(q0)
        trials.append(tr)
        fpss.append(fps)
    batched, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames,
                                        dtype=dtype)
    B = q0b.shape[0]

    # ---- stage 1: default kinematic FTE (batched) -------------------------
    # demand-driven heading multistart (parallel/batch.py) is the production
    # default path: a short fixed-length probe over all restarts picks the
    # basin, only the winner runs the remaining annealing stages
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    vrun = pbatch.make_kinematic_multistart(fte)
    t0 = time.time()
    st = vrun(q0b, batched)
    st.q.block_until_ready()
    kin_compile_s = time.time() - t0
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        st = vrun(q0b, batched)
        st.q.block_until_ready()
    kin_s = (time.time() - t0) / reps

    # quality sanity vs the true synthetic ground truth (stderr)
    def comvel_rmse(q_rec, tr, fps):
        n = tr.q_gt.shape[0]
        cv_r = np.diff(np.asarray(sk.com_position(q_rec[:n], subject)),
                       axis=0) * fps
        cv_g = np.diff(np.asarray(sk.com_position(tr.q_gt, subject)),
                       axis=0) * fps
        return float(np.sqrt(np.mean(np.sum((cv_r - cv_g) ** 2, axis=1))))

    qs64 = np.asarray(st.q, np.float64)
    mpes, kin_cvs = [], []
    for i, tr in enumerate(trials):
        n = tr.q_gt.shape[0]
        rec = np.asarray(sk.fk_markers(qs64[i, :n], subject))
        mpes.append(np.mean(np.linalg.norm(rec - tr.markers_gt, axis=2))
                    * 1e3)
        kin_cvs.append(comvel_rmse(qs64[i], tr, fpss[i]))
    print(f"# kinematic: compile={kin_compile_s:.1f}s run={kin_s*1e3:.0f}ms "
          f"MPE={np.mean(mpes):.0f}mm CoMvel={np.mean(kin_cvs):.3f}",
          file=sys.stderr)

    # ---- stage 2: contacts + physics-based FTE (batched) ------------------
    try:
        qs_default = [qs64[i, : tr.q_gt.shape[0]]
                      for i, tr in enumerate(trials)]
        # per-trial ground elevation from the GT feet (the synthetic stand-in
        # for the reference's metadata ground_plane_height — AcinoSet world
        # frames do not have the ground at z=0)
        from cheetah_pose_estimation_tpu.pipeline import contacts as cmod

        # ground elevations come from metadata.json in production
        # (acinoset_opt.py:464-472) — computing the synthetic stand-in is
        # not part of the per-batch host prep
        gphs = [cmod.estimate_ground_height(tr.q_gt, subject)
                for tr in trials]

        def host_prep():
            return bench_lib.build_physics_batch(
                datas, qs_default, fpss, subject, n_frames=n_frames,
                dtype=dtype, ground_heights=gphs)

        kfte = kn.KineticFTE(kn.KineticConfig(use_gmm=True), subject)
        kvrun = jax.jit(jax.vmap(kfte.make_solver()))
        # waves of 5: with the curv_chunk'd EOM curvature assembly
        # (kinetic.py) B=10 x N=64 now fits HBM in one wave, but the
        # while_loop syncs all lanes to the slowest straggler — measured on
        # the v5e the single 10-lane wave runs 11.0 s vs 8.8 s for two
        # 5-lane waves (each wave exits at ITS slowest lane), so the wave
        # size is a straggler/occupancy trade-off, not a memory limit
        CH = 5

        def run_chunks(q_warm_b, kbat):
            outs = [kvrun(q_warm_b[i:i + CH],
                          jax.tree.map(lambda x: x[i:i + CH], kbat))
                    for i in range(0, B, CH)]
            jax.block_until_ready(outs)
            return outs

        # warm-up: first host prep pays one-time jit compiles + prior-cache
        # fits, first solve pays the device compile — both excluded from the
        # steady-state timing, as for stage 1 (a production batch pipeline
        # amortizes them across dataset groups)
        t0 = time.time()
        kbat, q_warm_b = host_prep()
        ksts = run_chunks(q_warm_b, kbat)
        phys_compile_s = time.time() - t0
        host_s = 0.0
        t0 = time.time()
        for _ in range(reps):
            th = time.time()
            kbat, q_warm_b = host_prep()
            host_s += time.time() - th
            ksts = run_chunks(q_warm_b, kbat)
        phys_s = (time.time() - t0) / reps
        host_s /= reps
        kqs = np.concatenate([np.asarray(s.q, np.float64) for s in ksts])
        kmpes, phys_cvs = [], []
        for i, tr in enumerate(trials):
            n = tr.q_gt.shape[0]
            rec = np.asarray(sk.fk_markers(kqs[i, :n], subject))
            kmpes.append(np.mean(np.linalg.norm(rec - tr.markers_gt,
                                                axis=2)) * 1e3)
            phys_cvs.append(comvel_rmse(kqs[i], tr, fpss[i]))
        # Quality gates: (a) the physics stage must not degrade the
        # kinematic reconstruction it warm-starts from (1.02x leaves room
        # for per-trial noise while catching any regression to the round-1
        # "physics makes it worse" behavior); (b) it must IMPROVE mean
        # CoM-velocity RMSE — the dynamics-level quantity the stage owns
        # (the reference's physics mode pattern 0.70 -> 0.50, BASELINE.md;
        # here the grf_max cap + base-translation deadband make the
        # eliminated contact forces correct depth wobble instead of
        # absorbing it).
        ok = bool(np.all(np.isfinite(kqs))) \
            and np.mean(kmpes) < 1.02 * np.mean(mpes) \
            and np.mean(phys_cvs) < np.mean(kin_cvs)
        print(f"# physics: compile={phys_compile_s:.1f}s host={host_s:.1f}s "
              f"run={phys_s*1e3:.0f}ms MPE={np.mean(kmpes):.0f}mm "
              f"CoMvel={np.mean(phys_cvs):.3f} "
              f"(kin {np.mean(kin_cvs):.3f}) ok={ok}",
              file=sys.stderr)
    except Exception:
        traceback.print_exc(file=sys.stderr)
        ok = False

    if ok:
        # phys_s already includes the steady-state host prep (timed in-loop)
        s_per_trial = (kin_s + phys_s) / B
        baseline = BASELINE_DEFAULT_S + BASELINE_PHYSICS_S
        metric = "monocular_pipeline_default_plus_physics"
    else:
        s_per_trial = kin_s / B
        baseline = BASELINE_DEFAULT_S
        metric = "monocular_default_full_trial_reconstruction"

    print(json.dumps({
        "metric": metric,
        "value": round(60.0 / s_per_trial, 2),
        "unit": "trials/min",
        "vs_baseline": round(baseline / s_per_trial, 2),
    }))


if __name__ == "__main__":
    main()
