"""Pickle/dill helpers + windowed-dataset builder.

API-compatible replacement for ``common.py_utils.data_ops`` (missing from
the reference snapshot; semantics reconstructed from its 40+ call sites,
e.g. acinoset_opt.py:198,657 and acinoset_models.py:35).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
import pandas as pd


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(path: str, obj: Any) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_dill(path: str) -> Any:
    import dill
    with open(path, "rb") as f:
        return dill.load(f)


def save_dill(path: str, obj: Any) -> None:
    import dill
    with open(path, "wb") as f:
        dill.dump(obj, f)


def series_to_supervised(data, n_in: int = 1, n_step: int = 1
                         ) -> pd.DataFrame:
    """Sliding-window supervised table: columns
    [x(t-n_in*s), ..., x(t-s), x(t)], one row per target time t.

    Matches the reference call-site semantics (acinoset_models.py:27-58,
    acinoset_misc.py:316): the row index equals the target's position within
    its segment, so segment boundaries remain detectable via index == n_in*s.
    """
    X = np.asarray(data)
    if X.ndim == 1:
        X = X[:, None]
    n, d = X.shape
    first = n_in * n_step
    cols = []
    for lag in range(n_in, 0, -1):
        cols.append(X[first - lag * n_step: n - lag * n_step])
    cols.append(X[first:])
    table = np.concatenate(cols, axis=1)
    return pd.DataFrame(table, index=np.arange(first, n))


def prior_cache_dir(dataset_path: str) -> str:
    """Where to cache trained prior models for ``dataset_path``.

    The reference caches next to the dataset (models/data-driven,
    acinoset_models.py:191-211); we keep that convention only when the
    dataset's directory is a writable project location. A read-only or
    out-of-tree dataset (e.g. the mounted reference snapshot, which must
    never be written to) caches under ~/.cache instead.
    """
    d = os.path.dirname(os.path.abspath(dataset_path))
    if not d.startswith("/root/reference") and os.access(d, os.W_OK):
        return d
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "cheetah_pose_estimation_tpu")
    os.makedirs(cache, exist_ok=True)
    return cache
