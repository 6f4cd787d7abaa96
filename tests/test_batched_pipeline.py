"""Batched pipeline: vmapped group solve matches the serial path's quality."""
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.pipeline import batched as batched_mod
from cheetah_pose_estimation_tpu.pipeline import run_dataset as rd

REF = "/root/reference/data/test_set"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference test_set missing")]


def test_batched_matches_quality(tmp_path):
    root = str(tmp_path / "videos")
    out = str(tmp_path / "out")
    rd.materialize_synthetic_testset(root)
    subset = rd.TEST_SET[1:4]  # jules flick1, phantom run x2 -> 2 groups
    timings = batched_mod.run_monocular_batched(
        root, out, subset, modes=("ground-truth", "default"))
    assert set(timings) == {"ground-truth", "default"}
    for cheetah, date, trial in subset:
        data_path = os.path.join(date, cheetah, trial)
        with open(os.path.join(root, data_path, "synthetic_gt.pickle"),
                  "rb") as f:
            gt = pickle.load(f)
        d = dio.load_fte_pickle(os.path.join(out, data_path,
                                             "fte_kinematic", "fte.pickle"))
        err = np.linalg.norm(d["positions"] - gt["positions"],
                             axis=2).mean() * 1000
        # the correlated-corruption materializer (occlusion bursts, limb
        # confusion) costs the 6-camera solve a few mm vs the clean-noise
        # regime's ~10 mm
        assert err < 35.0, (data_path, err)
        dm = dio.load_fte_pickle(os.path.join(
            out, data_path, "fte_kinematic_orig_2", "fte.pickle"))
        errm = np.linalg.norm(dm["positions"] - gt["positions"],
                              axis=2).mean() * 1000
        assert errm < 500.0, (data_path, errm)


def test_ragged_camera_counts_and_dead_frames():
    """Batching trials with different camera counts and a frame whose
    detections are all gated out must stay finite and padded-camera-safe."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cheetah_pose_estimation_tpu.data import synthetic as syn
    from cheetah_pose_estimation_tpu.models import noise as noise_tables
    from cheetah_pose_estimation_tpu.models import params as P
    from cheetah_pose_estimation_tpu.models import skeleton as sk
    from cheetah_pose_estimation_tpu.parallel import batch as pbatch
    from cheetah_pose_estimation_tpu.pipeline import initialization as init
    from cheetah_pose_estimation_tpu.solver import kinematic as kin

    subject = P.get_subject("acinoset")
    datas, q0s, trials = [], [], []
    for i, n_cams in enumerate((2, 4)):
        q_gt = syn.gallop_trajectory(n_frames=10 + i, seed=i)
        center = np.asarray(sk.fk_markers(q_gt, subject)).mean(axis=(0, 1))
        scene = syn.ring_cameras(center, n_cams=n_cams, seed=i)
        trial = syn.synthesize(q_gt, subject, scene, seed=i)
        w = np.asarray(syn.gated_weights(trial))
        w[3] = 0.0                      # a frame with no usable detections
        q0 = init.initialize_trajectory(trial.meas, w, scene.K, scene.D,
                                        scene.R, scene.t, subject,
                                        fisheye=True)
        N = q_gt.shape[0]
        gmmp, ar = (kin.GMMPrior(np.zeros((1, 22)), np.eye(22)[None],
                                 np.zeros((1,))),
                    kin.ARAnchor(np.zeros((N, 28)), np.zeros(28),
                                 np.zeros(N)))
        datas.append(kin.KinematicData(
            meas=trial.meas, weight=w,
            cam=kin.CameraSet(scene.K, scene.D, scene.R, scene.t),
            h=np.asarray(1.0 / scene.fps),
            acc_weight=noise_tables.acc_model_weights(),
            frame_valid=np.ones(N), gmm=gmmp, ar=ar))
        q0s.append(q0)
        trials.append(trial)
    batched, q0b = pbatch.pad_and_stack(datas, q0s, n_frames=12,
                                        dtype=jnp.float32)
    assert batched.meas.shape[:2] == (2, 12) and batched.meas.shape[2] == 4
    fte = kin.KinematicFTE(kin.KinematicConfig(), subject)
    run = jax.jit(jax.vmap(fte.make_solver(stages=((3.0, 5), (1.0, 10)))))
    st = run(q0b, batched)
    assert bool(jnp.all(jnp.isfinite(st.q)))
    assert bool(jnp.all(jnp.isfinite(st.cost)))


def test_mesh_sharded_cli_artifacts_match_single_device(tmp_path):
    """VERDICT r2 #5 'Done' criterion: the production --batched pipeline
    with the default trial mesh (8 virtual CPU devices, conftest) writes
    artifacts equal, to f32 solve tolerance, to a forced single-device
    (mesh=None) run of the same trials."""
    import jax

    assert len(jax.devices()) >= 2, "conftest should give 8 CPU devices"
    root = str(tmp_path / "videos")
    rd.materialize_synthetic_testset(root)
    subset = rd.TEST_SET[2:4]  # phantom run x2 -> one 2-trial group
    outs = {}
    for tag, mesh in (("sharded", "auto"), ("single", None)):
        out = str(tmp_path / tag)
        batched_mod.run_monocular_batched(
            root, out, subset, modes=("ground-truth", "default"), mesh=mesh)
        outs[tag] = out
    for cheetah, date, trial in subset:
        data_path = os.path.join(date, cheetah, trial)
        with open(os.path.join(root, data_path, "synthetic_gt.pickle"),
                  "rb") as f:
            gt = pickle.load(f)["positions"]
        for run_dir, tol_mm in (("fte_kinematic", 10.0),
                                ("fte_kinematic_orig_2", None)):
            ds = dio.load_fte_pickle(os.path.join(
                outs["sharded"], data_path, run_dir, "fte.pickle"))
            d1 = dio.load_fte_pickle(os.path.join(
                outs["single"], data_path, run_dir, "fte.pickle"))
            if tol_mm is not None:
                # the well-posed multi-view solve is layout-stable to
                # pointwise mm level
                diff = np.linalg.norm(ds["positions"] - d1["positions"],
                                      axis=2).mean() * 1000
                assert diff < tol_mm, (data_path, run_dir, diff)
            else:
                # a FULL monocular solve is not layout-reproducible in f32
                # (see test_sharding_equivalence: ~1e-7 cost differences
                # flip LM accept/reject branches and the nonconvex paths
                # diverge along the depth-ambiguous direction) — the
                # meaningful artifact invariant is equal reconstruction
                # QUALITY vs ground truth, not equal solutions
                e = [np.linalg.norm(d["positions"] - gt, axis=2).mean()
                     * 1000 for d in (ds, d1)]
                # basin flips move monocular MPE by up to ~35 mm on one
                # trial (measured); a sharding BUG (scrambled trials,
                # garbage lanes) moves it by hundreds
                assert abs(e[0] - e[1]) < 60.0, (data_path, run_dir, e)
                assert max(e) < 500.0, (data_path, run_dir, e)
