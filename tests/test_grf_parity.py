"""Force-accuracy parity vs the reference's shipped kinetic solutions.

The reference validated its solved GRFs against force plates
(results.py:1416-1446); its fte_kinetic artifacts are therefore external
force truth for OUR force path (pipeline/grf_parity.py). Skipped when the
reference tree is unavailable.
"""
import os

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.pipeline import grf_parity as gp

pytestmark = pytest.mark.skipif(
    not os.path.isdir(gp.KINETIC_ROOT),
    reason="reference kinetic dataset not available")


@pytest.mark.slow
def test_grf_parity_on_reference_trial():
    """At the reference's own solved trajectory, our per-frame force
    elimination must reproduce its vertical GRF: the 6 base EOM rows pin
    the total contact force regardless of internal torque regularization."""
    tdirs = gp.kinetic_trial_dirs()
    assert tdirs, "no kinetic trials found"
    tdir = tdirs[1]  # 2009_09_07/shiraz/trial04 (the reference's headline)
    name = "arabia" if "arabia" in tdir else "shiraz"
    ref = gp.load_reference_kinetic_solution(tdir)
    stance = (ref["grf_z"] > gp.STANCE_THRESHOLD_BW).astype(float)
    _, gz, _ = gp.solve_forces_at(ref["q"], stance, name)
    sl = slice(2, None)
    d = gz[sl] - ref["grf_z"][sl]
    rmse = float(np.sqrt(np.mean(d ** 2)))
    tot, tot_ref = gz[sl].sum(1), ref["grf_z"][sl].sum(1)
    corr = float(np.corrcoef(tot, tot_ref)[0, 1])
    # measured across all 5 trials: rmse 0.024-0.049 BW, corr >= 0.9999
    assert rmse < 0.10, rmse
    assert corr > 0.995, corr


def test_reference_solution_loader_shapes():
    tdirs = gp.kinetic_trial_dirs()
    assert len(tdirs) == 5
    ref = gp.load_reference_kinetic_solution(tdirs[0])
    N = ref["q"].shape[0]
    assert ref["q"].shape == (N, 54)
    assert ref["tau"].shape == (N, 22)
    assert ref["grf_z"].shape == (N, 4)
    assert ref["grf_xy"].shape == (N, 4, 4)
    # body-weight sanity: peak total vertical force 1-4 BW during a gallop
    assert 1.0 < ref["grf_z"].sum(1).max() < 4.0
