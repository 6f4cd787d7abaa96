#!/usr/bin/env python
"""Benchmark: batched full-trial monocular kinematic reconstruction.

Baseline (BASELINE.md): the reference solves one monocular default-mode trial
in 20.9 s on CPU (IPOPT + MA97, mean over the 10-trial AcinoSet test set).
Here all 10 trials are padded, stacked, and solved as ONE vmapped batch on the
accelerator (float32, graduated-non-convexity LM over the block-banded normal
equations). Prints a single JSON line:

  {"metric": ..., "value": trials/min, "unit": "trials/min", "vs_baseline": x}

vs_baseline is the throughput ratio against the reference's 60/20.9 = 2.87
trials/min.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S_PER_TRIAL = 20.9


def main():
    from cheetah_pose_estimation_tpu.pipeline import bench_lib
    from cheetah_pose_estimation_tpu.solver import kinematic as kin

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=sys.stderr)

    # production batching: the 10 unique test trials tiled to a batch of 80
    # (per-iteration time is dispatch-bound, so larger batches amortize it
    # and the while-loop stragglers; quality is evaluated on the uniques)
    batched, q0b, trials, subject = bench_lib.build_batch(
        n_frames=64, dtype=jnp.float32, repeat_to=80)
    B = q0b.shape[0]
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    run = fte.make_solver()
    vrun = jax.jit(jax.vmap(run))

    # compile
    t0 = time.time()
    st = vrun(q0b, batched)
    st.q.block_until_ready()
    compile_s = time.time() - t0

    # timed runs
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        st = vrun(q0b, batched)
        st.q.block_until_ready()
    dt = (time.time() - t0) / reps

    s_per_trial = dt / B
    trials_per_min = 60.0 / s_per_trial
    vs_baseline = BASELINE_S_PER_TRIAL / s_per_trial

    # quality sanity: MPE/MPJPE vs the true synthetic ground truth (stderr).
    # For calibration: the reference's default monocular mode scores
    # MPE 264 / MPJPE 119 mm against its own multi-view solve (BASELINE.md).
    from cheetah_pose_estimation_tpu.models import skeleton as sk
    mpes, mpjpes = [], []
    for i, tr in enumerate(trials):
        n = tr.q_gt.shape[0]
        rec = np.asarray(sk.fk_markers(np.asarray(st.q[i][:n], np.float64),
                                       subject))
        gt = tr.markers_gt
        mpes.append(np.mean(np.linalg.norm(rec - gt, axis=2)) * 1e3)
        recc = rec - rec.mean(1, keepdims=True)
        gtc = gt - gt.mean(1, keepdims=True)
        mpjpes.append(np.mean(np.linalg.norm(recc - gtc, axis=2)) * 1e3)
    print(f"# batch={B} N=64 compile={compile_s:.1f}s run={dt*1e3:.1f}ms "
          f"({s_per_trial*1e3:.1f} ms/trial) MPE={np.mean(mpes):.0f}mm "
          f"MPJPE={np.mean(mpjpes):.0f}mm "
          f"costs_finite={bool(np.all(np.isfinite(np.asarray(st.cost))))}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "monocular_default_full_trial_reconstruction",
        "value": round(trials_per_min, 2),
        "unit": "trials/min",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
