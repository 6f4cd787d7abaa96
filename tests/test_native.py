"""Native C++ data runtime: build, parse parity with pandas, threading."""
import os
import time

import numpy as np
import pytest

from cheetah_pose_estimation_tpu import native
from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.models import skeleton as sk

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def dlc_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("dlc")
    N, L = 120, 24
    truth = []
    for c in range(4):
        xy = rng.normal(size=(N, L, 2)) * 500 + 900
        lik = rng.uniform(size=(N, L))
        # sprinkle NaNs like real DLC output
        xy[rng.uniform(size=(N, L)) < 0.01] = np.nan
        dio.save_dlc_table(str(d / f"cam{c + 1}.csv"), xy, lik,
                           start_frame=7)
        # remove the h5 sibling so only CSV is exercised
        h5 = d / f"cam{c + 1}.h5"
        if h5.exists():
            os.remove(h5)
        truth.append((xy, lik))
    return str(d), truth


def test_parse_single_matches_truth(dlc_dir):
    d, truth = dlc_dir
    xy, lik, idx = native.parse_dlc_csv(os.path.join(d, "cam1.csv"))
    assert xy.shape == (120, 24, 2)
    np.testing.assert_array_equal(idx, np.arange(7, 127))
    np.testing.assert_allclose(xy, truth[0][0].astype(np.float32), rtol=0,
                               atol=2e-2, equal_nan=True)
    np.testing.assert_allclose(lik, truth[0][1].astype(np.float32), rtol=0,
                               atol=1e-5)


def test_native_matches_pandas_loader(dlc_dir):
    d, truth = dlc_dir
    xy_n, lik_n, bp_n = dio.load_dlc_points(d, use_native=True)
    xy_p, lik_p, bp_p = dio.load_dlc_points(d, use_native=False)
    assert bp_n == bp_p == list(sk.MARKERS)
    assert xy_n.shape == xy_p.shape
    np.testing.assert_allclose(xy_n, xy_p, rtol=0, atol=2e-2, equal_nan=True)
    np.testing.assert_allclose(lik_n, lik_p, rtol=0, atol=1e-5)


def test_parallel_load_and_gating(dlc_dir):
    d, truth = dlc_dir
    paths = sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".csv"))
    tables = native.load_tables(paths, n_threads=4)
    assert len(tables) == 4
    inv_R = np.random.default_rng(1).uniform(0.1, 1.0, 24).astype(np.float32)
    w = native.gate_weights(tables[0][1], inv_R, 0.5)
    ref = np.where(tables[0][1] > 0.5, inv_R[None, :], 0.0)
    np.testing.assert_allclose(w, ref, rtol=0, atol=1e-7)
