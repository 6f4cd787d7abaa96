"""Training-data plumbing for the learned priors.

Replaces ``common.py_utils.data_ops.series_to_supervised`` (missing from the
reference snapshot; semantics reconstructed from call sites in
``acinoset_models.py:27-58,249-274`` and ``acinoset_misc.py:291-336``) and the
pose-dataset loading. Multi-run datasets are concatenated segments delimited
by an index reset to 0.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
import pandas as pd

POSE_COLUMNS = [
    "base_x", "base_y", "base_z", "base_phi", "base_theta", "base_psi",
    "bodyF_phi", "bodyF_theta", "bodyF_psi", "neck_phi", "neck_theta",
    "neck_psi", "tail0_theta", "tail0_psi", "tail1_theta", "tail1_psi",
    "ufl_theta", "lfl_theta", "hfl_theta", "ufr_theta", "lfr_theta",
    "hfr_theta", "ubl_theta", "lbl_theta", "ubr_theta", "lbr_theta",
    "hbl_theta", "hbr_theta",
]


def load_pose_dataset(path: str) -> pd.DataFrame:
    """Load dataset_full_pose / validation_dataset; accepts .h5 (pytables,
    else the h5py-direct pandas-table reader) or a .csv."""
    base, ext = os.path.splitext(path)
    if ext == ".h5":
        try:
            return pd.read_hdf(path)
        except ImportError:
            pass
        try:
            from ..data.io import load_pandas_h5
            return load_pandas_h5(path)
        except Exception:
            path = base + ".csv"
    return pd.read_csv(path, index_col=0)


def segment_bounds(index: np.ndarray) -> List[Tuple[int, int]]:
    """Split on index resets to 0 (multi-run concatenation)."""
    starts = np.where(np.asarray(index) == 0)[0]
    if len(starts) == 0:
        return [(0, len(index))]
    bounds = [(int(a), int(b)) for a, b in zip(starts, starts[1:])]
    bounds.append((int(starts[-1]), len(index)))
    return bounds


def series_to_supervised(X: np.ndarray, n_in: int,
                         n_step: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Sliding-window supervised table for one contiguous segment.

    Row for target time t (t from n_in*n_step to len-1):
      features = [x[t - n_in*n_step], x[t - (n_in-1)*n_step], ..., x[t - n_step]]
      target   = x[t]

    Returns (features (m, d*n_in), targets (m, d)).
    """
    X = np.asarray(X)
    n, d = X.shape
    first = n_in * n_step
    if n <= first:
        return np.empty((0, d * n_in)), np.empty((0, d))
    rows = []
    for lag in range(n_in, 0, -1):
        rows.append(X[first - lag * n_step: n - lag * n_step])
    feats = np.concatenate(rows, axis=1)
    return feats, X[first:]


def windowed_dataset(data: np.ndarray, index: np.ndarray, n_in: int,
                     n_step: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """series_to_supervised per segment, concatenated (reference
    ``MotionModel._read_dataset``)."""
    Xs, ys = [], []
    for a, b in segment_bounds(index):
        f, t = series_to_supervised(data[a:b], n_in, n_step)
        Xs.append(f)
        ys.append(t)
    return np.concatenate(Xs, axis=0), np.concatenate(ys, axis=0)
