"""Bench-set experiment: which AR-anchor weighting best serves CoM velocity?

Variants: (a) adaptive (production), (b) plain train weights,
(c) adaptive + one rolling anchor refresh from the solved dd trajectory.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from cheetah_pose_estimation_tpu.models import params as P, skeleton as sk
from cheetah_pose_estimation_tpu.parallel import batch as pbatch
from cheetah_pose_estimation_tpu.pipeline import bench_lib, estimator as est_mod
from cheetah_pose_estimation_tpu.priors import armodel, dataset as prior_ds, gmm as gmm_mod
from cheetah_pose_estimation_tpu.solver import kinematic as kin
from cheetah_pose_estimation_tpu.utils import data_ops
from cheetah_pose_estimation_tpu.utils.device import host_cpu, enable_compile_cache

enable_compile_cache()
dtype = jnp.float32
n_frames = 64
trajs = bench_lib.load_reference_trajectories(10)
subject = P.get_subject("acinoset")
datas, q0s, trials, fpss = [], [], [], []
for i, (q_gt, name, fps) in enumerate(trajs):
    d, q0, tr = bench_lib.build_monocular_problem(q_gt, "acinoset", fps, seed=i)
    datas.append(d); q0s.append(q0); trials.append(tr); fpss.append(fps)
batched, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=n_frames, dtype=dtype)
B = q0b.shape[0]

with host_cpu():
    dset = est_mod.DATA_DRIVEN_DATASET
    df = prior_ds.load_pose_dataset(dset)
    gp = gmm_mod.to_solver_prior(gmm_mod.fit(
        df.iloc[:, 6:28].to_numpy(), n_components=5, seed=42,
        cache_dir=data_ops.prior_cache_dir(dset)))
    mm = armodel.train_motion_model(dset, window_size=4, lasso=True,
                                    cache_dir=data_ops.prior_cache_dir(dset))
bat_dd = batched._replace(gmm=jax.tree.map(
    lambda x: jnp.broadcast_to(jnp.asarray(x, dtype),
                               (B,) + np.asarray(x).shape), gp))

fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
st_free = pbatch.make_kinematic_multistart(fte)(q0b, batched)
chain = kin.KinematicFTE(kin.KinematicConfig(fisheye=True, robust=True,
                                             use_gmm=True), subject)
st_chain = jax.jit(jax.vmap(chain.make_solver()))(st_free.q, bat_dd)
vcost = jax.jit(jax.vmap(lambda q, d: fte._cost(q, d, 1.0)))
c_free = np.asarray(vcost(st_free.q, bat_dd), np.float64)
c_chain = np.asarray(vcost(st_chain.q, bat_dd), np.float64)
prior_ok = c_chain <= 1.10 * c_free
qb = jnp.where(jnp.asarray(prior_ok)[:, None, None], st_chain.q, st_free.q)
fte_dd = kin.KinematicFTE(kin.KinematicConfig(fisheye=True, robust=True,
                                              use_gmm=True, use_ar=True),
                          subject)
vdd = jax.jit(jax.vmap(fte_dd.make_solver()))

def score(qs_batch, tag):
    cvs, mpes, mpjpes = [], [], []
    with host_cpu():
        for i, tr in enumerate(trials):
            n = tr.q_gt.shape[0]
            q = np.asarray(qs_batch[i, :n], np.float64)
            rec = np.asarray(sk.fk_markers(q, subject))
            err = rec - tr.markers_gt
            mpes.append(np.mean(np.linalg.norm(err, axis=2)) * 1e3)
            errr = (rec - rec.mean(1, keepdims=True)) - (
                tr.markers_gt - tr.markers_gt.mean(1, keepdims=True))
            mpjpes.append(np.mean(np.linalg.norm(errr, axis=2)) * 1e3)
            cv = np.diff(np.asarray(sk.com_position(q, subject)), axis=0) * fpss[i]
            cvg = np.diff(np.asarray(sk.com_position(tr.q_gt, subject)), axis=0) * fpss[i]
            cvs.append(np.sqrt(np.mean(np.sum((cv - cvg) ** 2, axis=1))))
    print(f"{tag}: MPE={np.mean(mpes):.1f} MPJPE={np.mean(mpjpes):.1f} "
          f"CoMvel={np.mean(cvs):.3f}", flush=True)

score(np.asarray(st_free.q), "free (default)")
score(np.asarray(qb), "bootstrap (gated chain)")

def anchors(q_src, adaptive=True):
    fv = np.asarray(batched.frame_valid)
    yps, ws, vls = [], [], []
    q_np = np.asarray(q_src, np.float64)
    with host_cpu():
        for i in range(B):
            x = np.asarray(sk.relative_pose(q_np[i]))
            yp, vl = armodel.anchor_predictions(mm, x)
            vl = vl * fv[i]
            w = (armodel.adaptive_motion_weights(mm, yp, x, vl)
                 if adaptive else armodel.motion_weights(mm))
            yps.append(yp); ws.append(w); vls.append(vl)
    return bat_dd._replace(ar=kin.ARAnchor(
        jnp.asarray(np.stack(yps), dtype), jnp.asarray(np.stack(ws), dtype),
        jnp.asarray(np.stack(vls), dtype)))

bat_a = anchors(qb, adaptive=True)
st_a = vdd(qb, bat_a)
score(np.asarray(st_a.q), "dd adaptive (production)")

bat_b = anchors(qb, adaptive=False)
st_b = vdd(qb, bat_b)
score(np.asarray(st_b.q), "dd train-weights")

bat_c = anchors(st_a.q, adaptive=True)
st_c = vdd(st_a.q, bat_c)
score(np.asarray(st_c.q), "dd adaptive + rolling refresh")
