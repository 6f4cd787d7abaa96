"""Pickle/dill helpers + windowed-dataset builder.

API-compatible replacement for ``common.py_utils.data_ops`` (missing from
the reference snapshot; semantics reconstructed from its 40+ call sites,
e.g. acinoset_opt.py:198,657 and acinoset_models.py:35).
"""
from __future__ import annotations

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
