"""ctypes bindings for the native trial-data runtime (dlc_loader.cpp).

Compiled lazily with g++ on first use; every entry point has a pure-Python
fallback so the framework works without a toolchain. The native path is used
by ``data.io.load_dlc_points`` for CSV tables (pytables is absent in this
image, so CSV is the working interchange format) and parallelizes across
cameras/trials with a thread pool.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "dlc_loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_dlc_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> Optional[str]:
    try:
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        so = _SO if (os.path.exists(_SO)
                     and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)) \
            else _build()
        if so is None:
            _failed = True
            return None
        lib = ctypes.CDLL(so)
        lib.ctl_probe_csv.restype = ctypes.c_int
        lib.ctl_probe_csv.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.ctl_parse_dlc_csv.restype = ctypes.c_int
        lib.ctl_parse_dlc_csv.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int]
        lib.ctl_load_trials.restype = ctypes.c_int
        lib.ctl_load_trials.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
        lib.ctl_gate_weights.restype = None
        lib.ctl_gate_weights.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def probe_csv(path: str) -> Tuple[int, int]:
    lib = get_lib()
    assert lib is not None
    nf = ctypes.c_int()
    nm = ctypes.c_int()
    rc = lib.ctl_probe_csv(path.encode(), ctypes.byref(nf), ctypes.byref(nm))
    if rc != 0:
        raise IOError(f"probe failed ({rc}) for {path}")
    return nf.value, nm.value


def parse_dlc_csv(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(xy (n, m, 2) f32, lik (n, m) f32, index (n,) i32) for one table."""
    lib = get_lib()
    assert lib is not None
    n, m = probe_csv(path)
    xy = np.empty((n, m, 2), np.float32)
    lik = np.empty((n, m), np.float32)
    idx = np.empty((n,), np.int32)
    rows = lib.ctl_parse_dlc_csv(
        path.encode(), xy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lik.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, m)
    if rows < 0:
        raise IOError(f"parse failed ({rows}) for {path}")
    return xy[:rows], lik[:rows], idx[:rows]


def load_tables(paths: List[str], n_threads: int = 0
                ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parallel parse of many DLC tables (per-camera files of one or many
    trials). Returns a list of (xy, lik, index)."""
    lib = get_lib()
    assert lib is not None
    n_threads = n_threads or min(len(paths), os.cpu_count() or 4)
    shapes = [probe_csv(p) for p in paths]
    m = shapes[0][1]
    xys = [np.empty((n, mm, 2), np.float32) for n, mm in shapes]
    liks = [np.empty((n, mm), np.float32) for n, mm in shapes]
    idxs = [np.empty((n,), np.int32) for n, mm in shapes]
    n_paths = len(paths)
    c_paths = (ctypes.c_char_p * n_paths)(*[p.encode() for p in paths])
    c_xy = (ctypes.POINTER(ctypes.c_float) * n_paths)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in xys])
    c_lik = (ctypes.POINTER(ctypes.c_float) * n_paths)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in liks])
    c_idx = (ctypes.POINTER(ctypes.c_int32) * n_paths)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in idxs])
    c_caps = (ctypes.c_int * n_paths)(*[s[0] for s in shapes])
    rc = lib.ctl_load_trials(c_paths, n_paths, c_xy, c_lik, c_idx, c_caps,
                             m, n_threads)
    if rc != 0:
        raise IOError("parallel table load failed")
    return list(zip(xys, liks, idxs))


def gate_weights(lik: np.ndarray, inv_R: np.ndarray,
                 thresh: float) -> np.ndarray:
    """Fused likelihood gating: w = (lik > thresh) * inv_R (native or numpy)."""
    lib = get_lib()
    lik = np.ascontiguousarray(lik, np.float32)
    inv_R = np.ascontiguousarray(inv_R, np.float32)
    if lib is None:
        return np.where(lik > thresh, inv_R[None, :], 0.0)
    n, m = lik.shape
    out = np.empty_like(lik)
    lib.ctl_gate_weights(
        lik.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inv_R.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(thresh),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m)
    return out
