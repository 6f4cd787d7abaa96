"""Mesh-sharded batched reconstruction — the multi-chip user entry point.

The workload's scaling axis is trials x modes x cameras (SURVEY.md §2.13):
whole trials are padded, stacked into one pytree, sharded over a 1-D
`jax.sharding.Mesh`, and solved as ONE vmapped program; each trial's
block-banded system stays device-local so only scalar reductions ride the
ICI. On real hardware the mesh uses the available accelerator devices
(all of them, or the first --devices). To smoke-test multi-chip semantics
without hardware, pin a virtual CPU mesh explicitly:

    python examples/sharded_batch.py --virtual_cpu --devices 8
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="mesh size (default: all available devices)")
    ap.add_argument("--virtual_cpu", action="store_true",
                    help="pin a virtual CPU mesh of --devices devices "
                         "(multi-chip smoke test without hardware)")
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()

    import jax
    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices or 8)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cheetah_pose_estimation_tpu.data import synthetic as syn
    from cheetah_pose_estimation_tpu.models import params as params_mod
    from cheetah_pose_estimation_tpu.models import skeleton as sk
    from cheetah_pose_estimation_tpu.parallel import batch as pbatch
    from cheetah_pose_estimation_tpu.pipeline import bench_lib
    from cheetah_pose_estimation_tpu.solver import kinematic as kin

    n_dev = min(args.devices or len(jax.devices()), len(jax.devices()),
                args.trials)
    subject = params_mod.get_subject("acinoset")

    datas, q0s, trials = [], [], []
    for i in range(args.trials):
        q_gt = syn.gallop_trajectory(n_frames=args.frames, seed=i)
        d, q0, tr = bench_lib.build_monocular_problem(
            q_gt, "acinoset", 120.0, seed=i, n_cams=6, cam_idx=2)
        datas.append(d)
        q0s.append(q0)
        trials.append(tr)
    batched, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=args.frames,
                                        dtype=jnp.float32)

    mesh = pbatch.trial_mesh(n_dev)
    batched = pbatch.shard_batch(batched, mesh)
    q0b = jax.device_put(q0b, NamedSharding(
        mesh, P(pbatch.TRIAL_AXIS, None, None)))
    print(f"mesh: {mesh}; q0 sharding: {q0b.sharding}")

    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    run = jax.jit(jax.vmap(fte.make_solver()))
    st = run(q0b, batched)
    jax.block_until_ready(st.q)
    t0 = time.time()
    st = run(q0b, batched)
    jax.block_until_ready(st.q)
    dt = time.time() - t0

    qs = np.asarray(st.q, np.float64)
    mpes = []
    for i, tr in enumerate(trials):
        n = tr.q_gt.shape[0]
        rec = np.asarray(sk.fk_markers(qs[i, :n], subject))
        mpes.append(np.mean(np.linalg.norm(rec - tr.markers_gt, axis=2))
                    * 1e3)
    print(f"{args.trials} trials on {n_dev} device(s): {dt*1e3:.0f} ms, "
          f"mean monocular MPE {np.mean(mpes):.0f} mm")


if __name__ == "__main__":
    main()
