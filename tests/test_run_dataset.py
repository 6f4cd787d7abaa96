"""Dataset driver: materialize -> run_monocular -> post-process round trip."""
import os

import numpy as np
import pandas as pd
import pytest

from cheetah_pose_estimation_tpu.pipeline import run_dataset as rd

REF = "/root/reference/data/test_set"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference test_set missing")]


def test_driver_roundtrip(tmp_path):
    root = str(tmp_path / "videos")
    out = str(tmp_path / "out")
    made = rd.materialize_synthetic_testset(root)
    assert len(made) == 10
    subset = rd.TEST_SET[1:3]
    rd.run_monocular(root, out, subset,
                     modes=("ground-truth", "default", "data-driven"),
                     verbose=False)
    df = rd.dataset_post_process(root, out, subset, save_plots=False)
    assert not df.empty
    csv = os.path.join(out, "dataset_results.csv")
    assert os.path.exists(csv)
    back = pd.read_csv(csv, header=[0, 1], index_col=0)
    # same row schema as the reference's shipped dataset_results.csv
    ref = pd.read_csv(os.path.join(REF, "dataset_results.csv"),
                      header=[0, 1], index_col=0)
    assert set(back.index) == set(ref.index)
    for trial in subset:
        col = (os.path.join(trial[1], trial[0], trial[2]), "default")
        assert float(back.loc["mpe", col]) < 500.0
    # validation filters pass on sane output
    report = rd.validate_dataset(out, subset)
    assert report and all(report.values())
    # error-vs-distance analysis
    dve = rd.distance_vs_error(root, out, subset, save_plot=True)
    assert len(dve) >= 2
    assert os.path.exists(os.path.join(out, "dist_vs_error.pdf"))


def test_is_outlier():
    from cheetah_pose_estimation_tpu.pipeline.run_dataset import is_outlier
    import numpy as np
    x = np.array([1.0, 1.1, 0.9, 1.05, 0.95, 40.0])
    mask = is_outlier(x, 3.5)
    assert mask[-1] and not mask[:-1].any()
    # constant data: no outliers (MAD = 0 guard)
    assert not is_outlier(np.ones(5)).any()
