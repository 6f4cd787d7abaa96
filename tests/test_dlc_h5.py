"""h5py-direct DLC .h5 ingestion (no pytables on this image).

Real AcinoSet trials ship DLC predictions as .h5 only
(reference ``acinoset_misc.py:1545-1572``); these tests fabricate an
.h5-only trial dir and drive it through the loading pipeline.
"""
import glob
import os

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.data import io as dio
from cheetah_pose_estimation_tpu.data import synthetic as syn
from cheetah_pose_estimation_tpu.models import params as P

REF_H5 = "/root/reference/models/data-driven/dataset_full_pose.h5"
REF_CSV = "/root/reference/models/data-driven/dataset_full_pose.csv"


@pytest.mark.skipif(not os.path.exists(REF_H5),
                    reason="reference dataset unavailable")
def test_reads_reference_pandas_table_h5():
    import pandas as pd
    df = dio.load_pandas_h5(REF_H5)
    ref = pd.read_csv(REF_CSV, index_col=0)
    assert df.shape == ref.shape
    np.testing.assert_allclose(df.to_numpy(), ref.to_numpy())
    assert (df.index.to_numpy() == ref.index.to_numpy()).all()
    assert list(df.columns) == list(ref.columns)


def test_dlc_h5_roundtrip_multiindex(tmp_path):
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 2000, size=(9, 24, 2))
    lik = rng.uniform(size=(9, 24))
    p = str(tmp_path / "cam1.h5")
    dio.save_dlc_table(p, xy, lik, write_csv=False)
    assert not os.path.exists(str(tmp_path / "cam1.csv"))
    df = dio.load_dlc_table(p)
    assert df.columns.nlevels == 3
    arr = df.to_numpy().reshape(9, 24, 3)
    np.testing.assert_allclose(arr[..., :2], xy)
    np.testing.assert_allclose(arr[..., 2], lik)


def test_h5_only_trial_dir_loads(tmp_path):
    """A fabricated .h5-only trial dir (no .csv siblings) round-trips through
    init_trajectory's measurement loading."""
    from cheetah_pose_estimation_tpu.pipeline import estimator as est_mod

    subject = P.get_subject("acinoset")
    q = syn.gallop_trajectory(12, seed=1)
    tr = syn.synthesize(q, subject, seed=1)
    root = str(tmp_path)
    syn.write_trial_dir(tr, root, "trial_a", monocular_cam=1)
    for f in glob.glob(os.path.join(root, "trial_a", "dlc", "*.csv")):
        os.remove(f)
    assert glob.glob(os.path.join(root, "trial_a", "dlc", "*.h5"))
    est = est_mod.init_trajectory(root, "trial_a", "acinoset",
                                  monocular_enable=True)
    assert est.xy.shape == (12, 6, 24, 2)
    assert np.isfinite(est.xy).all()
    # measurements must match what was rendered
    np.testing.assert_allclose(est.xy[:, 1], tr.meas[:, 1, :, :, 0],
                               atol=1e-9)
