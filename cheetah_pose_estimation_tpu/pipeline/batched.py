"""Batched dataset execution: many trials as one vmapped TPU solve.

The reference loops trials serially, rebuilding a Pyomo model and invoking
IPOPT per (trial, mode) — `run_dataset.py:1143-1231`. Here the per-trial
problems are padded and stacked (parallel/batch.py) and each mode's whole
trial set solves as ONE jitted vmapped GN run (sharded over a device mesh
when multiple chips are available), then unpacked into the standard
fte.pickle / cam*_fte artifacts. Trials are grouped by subject (the FK
coefficient tensors are per-morphology compile-time constants).
"""
from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import params as params_mod
from ..models import skeleton as sk
from ..parallel import batch as pbatch
from ..priors import armodel, dataset as prior_ds, gmm as gmm_mod
from ..solver import kinematic as kin
from . import estimator as est_mod


def _prepare(root_dir: str, data_path: str, cheetah: str,
             cam_override: Optional[int], monocular: bool):
    est = est_mod.init_trajectory(
        root_dir, data_path, cheetah, kinematic_model=True,
        monocular_enable=monocular, override_monocular_cam=cam_override)
    # initialization (host-side, CPU-pinned)
    import numpy as _np

    from ..models import noise as noise_tables
    from . import initialization as init_mod
    full_weight = _np.einsum(
        "wl,ncl->nclw",
        noise_tables.measurement_weights(1, est.params.kinetic_dataset),
        (est.likelihood > est.params.dlc_thresh).astype(float))
    q0 = init_mod.initialize_trajectory(
        est.xy[..., None], full_weight, est.scene.k_arr, est.scene.d_arr,
        est.scene.r_arr, est.scene.t_arr, est.subject,
        fisheye=not est.params.kinetic_dataset, cam_idx=est.scene.cam_idx)
    est.q0 = q0
    return est


def run_monocular_batched(root_dir: str, dir_prefix: str,
                          test_set: Sequence[Tuple[str, str, str]],
                          cam_overrides: Optional[List[int]] = None,
                          modes: Sequence[str] = ("ground-truth", "default",
                                                  "data-driven"),
                          data_driven_dataset: Optional[str] = None,
                          dtype=jnp.float32,
                          motion_prior_rolling: int = 0,
                          mesh: Optional[object] = None,
                          verbose: bool = True) -> Dict[str, float]:
    # float32 is the throughput configuration: the kinematic solver is
    # quality-equivalent in f32 (solver-wide full-precision matmuls), while
    # f64 on TPU runs through emulation ~10x slower.
    """Solve every (mode, trial) with one vmapped run per (mode, subject)
    group. Returns per-mode wall times."""
    timings: Dict[str, float] = {}
    for mode in modes:
        t0 = time.time()
        monocular = mode != "ground-truth"
        groups: Dict[str, List] = defaultdict(list)
        for idx, (cheetah, date, trial_name) in enumerate(test_set):
            data_path = os.path.join(date, cheetah, trial_name)
            if not os.path.isdir(os.path.join(root_dir, data_path)):
                continue
            cam = cam_overrides[idx] if cam_overrides is not None else None
            est = _prepare(root_dir, data_path, cheetah, cam, monocular)
            groups[params_mod.get_subject(cheetah).name].append(est)
        for subject_name, ests in groups.items():
            subject = params_mod.get_subject(subject_name)
            use_priors = mode == "data-driven"
            datas, q0s, mms = [], [], []
            for est in ests:
                data = est.data
                if use_priors:
                    dset = (data_driven_dataset
                            or est_mod.DATA_DRIVEN_DATASET)
                    df = prior_ds.load_pose_dataset(dset)
                    gp = gmm_mod.to_solver_prior(gmm_mod.fit(
                        df.iloc[:, 6:28].to_numpy(), n_components=5,
                        seed=42))
                    mm = armodel.train_motion_model(
                        dset, window_size=4, lasso=True,
                        cache_dir=os.path.dirname(dset))
                    mms.append(mm)
                    x_init = np.asarray(sk.relative_pose(est.q0))
                    y_pred, valid = armodel.anchor_predictions(mm, x_init)
                    data = data._replace(
                        gmm=gp,
                        ar=kin.ARAnchor(jnp.asarray(y_pred),
                                        jnp.asarray(
                                            armodel.motion_weights(mm)),
                                        jnp.asarray(valid)))
                datas.append(data)
                q0s.append(est.q0)
            n_frames = int(np.ceil(max(d.meas.shape[0]
                                       for d in datas) / 16) * 16)
            batched, q0b = pbatch.pad_and_stack(datas, q0s,
                                                n_frames=n_frames,
                                                dtype=dtype)
            if mesh is not None:
                batched = pbatch.shard_batch(batched, mesh)
                q0b = jax.device_put(q0b)
            cfg = kin.KinematicConfig(
                fisheye=True, robust=True, use_gmm=use_priors,
                use_ar=use_priors)
            fte = kin.KinematicFTE(cfg, subject)
            run = fte.make_solver()
            vrun = jax.jit(jax.vmap(run))
            state = vrun(q0b, batched)
            if use_priors and motion_prior_rolling > 0:
                # lagged true-AR refinement: recompute the anchor
                # predictions from the current solutions and re-solve
                for _ in range(motion_prior_rolling):
                    ypreds, valids = [], []
                    fv = np.asarray(batched.frame_valid)
                    for i, est in enumerate(ests):
                        x_cur = np.asarray(sk.relative_pose(
                            np.asarray(state.q[i], np.float64)))
                        yp, vl = armodel.anchor_predictions(mms[i], x_cur)
                        ypreds.append(yp)
                        valids.append(vl * fv[i])
                    batched = batched._replace(ar=batched.ar._replace(
                        y_pred=jnp.asarray(np.stack(ypreds), dtype),
                        valid=jnp.asarray(np.stack(valids), dtype)))
                    state = vrun(state.q, batched)
            qs = np.asarray(state.q, np.float64)
            for i, est in enumerate(ests):
                n = est.data.meas.shape[0]
                est.q = qs[i, :n]
                est.obj_cost = float(fte.objective(
                    jnp.asarray(est.q), est.data))
                est.opt_time_s = (time.time() - t0) / max(len(ests), 1)
                if monocular:
                    fname = (f"fte_kinematic_{est.scene.cam_idx}"
                             if use_priors
                             else f"fte_kinematic_orig_{est.scene.cam_idx}")
                else:
                    fname = "fte_kinematic"
                est.save(fname, out_dir_prefix=dir_prefix)
        timings[mode] = time.time() - t0
        if verbose:
            print(f"[batched] mode={mode}: {timings[mode]:.1f}s for "
                  f"{sum(len(v) for v in groups.values())} trials")
    return timings
