"""AcinoSet interchange IO: scene calibration, metadata, DLC tables,
fte.pickle and per-camera 2D reprojection outputs.

Formats preserved byte/schema-compatible with the reference so downstream
comparison and video rendering tooling is unchanged (SURVEY.md §2.12):

* ``extrinsic_calib/N_cam_scene_sba.json`` — camera intrinsics/distortion/
  extrinsics (reference ``load_scene``/``find_scene_file``,
  acinoset_misc.py:1496-1542);
* ``metadata.json`` — start/end frame, cam_sync offsets, ground plane height,
  monocular cam (acinoset_opt.py:464-472);
* DLC prediction tables ``dlc/cam*.h5`` (+ .csv) with the MultiIndex
  (scorer, bodyparts, {x, y, likelihood}) layout;
* ``fte.pickle`` with keys positions/x/dx/ddx/q/dq/ddq/com_pos/com_vel/tau/
  meas_err/obj_cost/processing_time_s/start_frame (acinoset_opt.py:330-361);
* ``cam<i>_fte.h5/.csv`` reprojections in DLC format
  (acinoset_misc.py:1346-1407).

pandas HDF reading requires pytables; where it is unavailable the readers
fall back to the sibling .csv files, and our writers always emit both.
"""
from __future__ import annotations

import json
import os
import pickle
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..models.skeleton import MARKERS


# ---------------------------------------------------------------------------
# scene calibration
# ---------------------------------------------------------------------------

def load_scene(fpath: str):
    """(k_arr, d_arr, r_arr, t_arr, cam_res) from a scene json."""
    with open(fpath, "r", encoding="utf-8") as f:
        data = json.load(f)
    cam_res = tuple(data["camera_resolution"])
    k_arr = np.array([c["k"] for c in data["cameras"]], dtype=np.float64)
    d_arr = np.array([c["d"] for c in data["cameras"]], dtype=np.float64)
    r_arr = np.array([c["r"] for c in data["cameras"]], dtype=np.float64)
    t_arr = np.array([c["t"] for c in data["cameras"]], dtype=np.float64)
    return k_arr, d_arr, r_arr, t_arr, cam_res


def save_scene(fpath: str, k_arr, d_arr, r_arr, t_arr,
               cam_res: Tuple[int, int]):
    cams = []
    for k, d, r, t in zip(k_arr, d_arr, r_arr, t_arr):
        cams.append({
            "k": np.asarray(k).tolist(),
            "d": np.asarray(d).reshape(-1, 1).tolist(),
            "r": np.asarray(r).tolist(),
            "t": np.asarray(t).reshape(-1, 1).tolist(),
        })
    os.makedirs(os.path.dirname(fpath), exist_ok=True)
    with open(fpath, "w", encoding="utf-8") as f:
        json.dump({"camera_resolution": list(cam_res), "cameras": cams}, f)


def find_scene_file(dir_path: str, scene_fname: Optional[str] = None,
                    verbose: bool = False):
    """Walk up from dir_path looking for extrinsic_calib/N_cam_scene_sba.json
    (reference acinoset_misc.py:1518-1542)."""
    if scene_fname is None:
        n_cams = len(glob(os.path.join(dir_path, "cam[1-9].mp4")))
        scene_fname = (f"{n_cams}_cam_scene_sba.json" if n_cams
                       else "[1-9]_cam_scene*.json")
    path = dir_path
    while path and path != os.path.sep:
        pattern = os.path.join(path, "extrinsic_calib", scene_fname)
        candidates = sorted(
            p for p in glob(pattern)
            if "before_corrections" not in p or p == pattern)
        if candidates:
            fpath = candidates[-1]
            k, d, r, t, res = load_scene(fpath)
            n_cams = int(os.path.basename(fpath)[0])
            return k, d, r, t, res, n_cams, fpath
        parent = os.path.dirname(path)
        if parent == path:
            break
        path = parent
    raise FileNotFoundError(
        os.path.join("extrinsic_calib", str(scene_fname)))


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------

def load_metadata(data_dir: str) -> Dict:
    with open(os.path.join(data_dir, "metadata.json"), "r",
              encoding="utf-8") as f:
        return json.load(f)


def save_metadata(data_dir: str, start_frame: int, end_frame: int,
                  cam_sync: Optional[List[Dict]] = None,
                  ground_plane_height: float = 0.0,
                  monocular_cam: int = 0, **extra):
    os.makedirs(data_dir, exist_ok=True)
    meta = dict(start_frame=int(start_frame), end_frame=int(end_frame),
                cam_sync=cam_sync or [],
                ground_plane_height=float(ground_plane_height),
                monocular_cam=int(monocular_cam), **extra)
    with open(os.path.join(data_dir, "metadata.json"), "w",
              encoding="utf-8") as f:
        json.dump(meta, f)


# ---------------------------------------------------------------------------
# DLC prediction tables
# ---------------------------------------------------------------------------

DLC_SCORER = "cheetah_tpu"


def _write_pandas_h5_table(fpath: str, df: pd.DataFrame):
    """Write a DataFrame as a pandas PyTables 'table'-format HDF5 file via
    h5py (pytables is absent on this image). Produces the same essential
    layout real DLC ``.h5`` predictions use — a ``df_with_missing/table``
    compound dataset with the columns pickled into ``non_index_axes`` — so
    :func:`load_pandas_h5` round-trips it."""
    import pickle as _p

    import h5py
    values = df.to_numpy(np.float64)
    index = df.index.to_numpy(np.int64)
    cols = list(df.columns)
    dt = np.dtype([("index", "<i8"),
                   ("values_block_0", "<f8", (values.shape[1],))])
    arr = np.empty(len(index), dt)
    arr["index"] = index
    arr["values_block_0"] = values
    with h5py.File(fpath, "w") as f:
        g = f.create_group("df_with_missing")
        g.attrs["pandas_type"] = np.bytes_(b"frame_table")
        g.attrs["table_type"] = np.bytes_(b"appendable_frame")
        g.attrs["levels"] = np.int64(df.columns.nlevels)
        g.attrs["non_index_axes"] = np.bytes_(
            _p.dumps([(1, cols)], protocol=0))
        g.attrs["index_cols"] = np.bytes_(
            _p.dumps([(0, "index")], protocol=0))
        g.attrs["encoding"] = np.bytes_(b"UTF-8")
        g.create_dataset("table", data=arr)


def load_pandas_h5(fpath: str) -> pd.DataFrame:
    """Read a pandas-written HDF5 table directly with h5py (no pytables).

    Handles the PyTables 'table' format (``<key>/table`` compound dataset,
    columns pickled in the group's ``non_index_axes`` attr) that DeepLabCut
    and the reference's shipped datasets use
    (``acinoset_misc.py:1545-1572``, ``models/data-driven/*.h5``), and the
    'fixed' format (``axis0*/axis1/block0_values``) as a fallback.
    """
    import pickle as _p

    import h5py
    with h5py.File(fpath, "r") as f:
        key = list(f.keys())[0]
        g = f[key]
        if "table" in g:                       # PyTables 'table' format
            t = g["table"][...]
            index = t["index"]
            blocks = [t[n] for n in t.dtype.names if n.startswith("values")]
            values = np.concatenate(
                [b.reshape(len(t), -1) for b in blocks], axis=1)
            cols = _p.loads(bytes(g.attrs["non_index_axes"]))[0][1]
        else:                                   # 'fixed' format
            index = g["axis1"][...]
            values = g["block0_values"][...]
            nlev = sum(1 for k in g if k.startswith("axis0_level"))
            if nlev:
                levels = [[v.decode() if isinstance(v, bytes) else v
                           for v in g[f"axis0_level{i}"][...]]
                          for i in range(nlev)]
                labels = [g[f"axis0_label{i}"][...] for i in range(nlev)]
                cols = [tuple(levels[i][labels[i][j]] for i in range(nlev))
                        for j in range(len(labels[0]))]
            else:
                cols = [v.decode() if isinstance(v, bytes) else v
                        for v in g["axis0"][...]]
    cols = [tuple(x.decode() if isinstance(x, bytes) else x for x in c)
            if isinstance(c, tuple) else
            (c.decode() if isinstance(c, bytes) else c) for c in cols]
    if cols and isinstance(cols[0], tuple):
        names = (["scorer", "bodyparts", "coords"]
                 if len(cols[0]) == 3 else None)
        columns = pd.MultiIndex.from_tuples(cols, names=names)
    else:
        columns = pd.Index(cols)
    return pd.DataFrame(values, index=np.asarray(index), columns=columns)


def save_dlc_table(fpath: str, xy: np.ndarray, likelihood: np.ndarray,
                   bodyparts: Sequence[str] = MARKERS,
                   scorer: str = DLC_SCORER, start_frame: int = 0,
                   write_csv: bool = True):
    """Write a DLC-style prediction table (n_frames, L, 2) + (n_frames, L).

    Emits a real .h5 (pytables if available, else the h5py writer) and,
    unless disabled, a .csv sibling.
    """
    n, L = xy.shape[0], xy.shape[1]
    cols = pd.MultiIndex.from_product(
        [[scorer], list(bodyparts), ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"])
    data = np.concatenate([xy, likelihood[..., None]], axis=2)
    df = pd.DataFrame(data.reshape(n, -1), columns=cols,
                      index=range(start_frame, start_frame + n))
    os.makedirs(os.path.dirname(fpath), exist_ok=True)
    base = os.path.splitext(fpath)[0]
    if write_csv:
        df.to_csv(base + ".csv")
    try:
        df.to_hdf(base + ".h5", key="df_with_missing", mode="w")
    except ImportError:
        _write_pandas_h5_table(base + ".h5", df)


def load_dlc_table(fpath: str) -> pd.DataFrame:
    """Load a DLC table: .h5 via pytables when present, else the h5py-direct
    reader (real AcinoSet trials ship .h5 only); .csv as a last resort."""
    base, ext = os.path.splitext(fpath)
    if ext == ".h5":
        try:
            return pd.read_hdf(fpath)
        except ImportError:
            pass
        try:
            return load_pandas_h5(fpath)
        except Exception:
            fpath = base + ".csv"
    return pd.read_csv(fpath, header=[0, 1, 2], index_col=0)


def load_dlc_points(dlc_dir: str, n_cams: Optional[int] = None,
                    use_native: bool = True):
    """All per-camera DLC tables of a trial as arrays.

    Returns (xy (n_frames, C, L, 2), likelihood (n_frames, C, L), bodyparts).
    Table rows are aligned on the frame index (missing frames NaN / lik 0).
    CSV tables go through the threaded C++ parser when available.
    """
    paths = sorted(glob(os.path.join(dlc_dir, "*.h5")))
    if not paths:
        paths = sorted(glob(os.path.join(dlc_dir, "*.csv")))
    if n_cams is not None:
        assert len(paths) == n_cams, (len(paths), n_cams)
    if use_native and paths and paths[0].endswith(".csv"):
        try:
            from .. import native
            if native.available():
                return _load_dlc_points_native(paths)
        except Exception:
            pass  # fall through to the pandas path
    dfs = [load_dlc_table(p) for p in paths]
    bodyparts = list(dict.fromkeys(
        dfs[0].columns.get_level_values("bodyparts")))
    n_frames = max(int(df.index.max()) for df in dfs) + 1
    C, L = len(dfs), len(bodyparts)
    xy = np.full((n_frames, C, L, 2), np.nan)
    lik = np.zeros((n_frames, C, L))
    for c, df in enumerate(dfs):
        scorer = df.columns.get_level_values(0)[0]
        idx = df.index.to_numpy().astype(int)
        for l, bp in enumerate(bodyparts):
            xy[idx, c, l, 0] = df[(scorer, bp, "x")].to_numpy()
            xy[idx, c, l, 1] = df[(scorer, bp, "y")].to_numpy()
            lik[idx, c, l] = df[(scorer, bp, "likelihood")].to_numpy()
    return xy, lik, bodyparts


def _load_dlc_points_native(paths):
    """Threaded C++ CSV parse of all per-camera tables (native runtime)."""
    from .. import native

    tables = native.load_tables(paths)
    # bodyparts come from the CSV header of the first file
    with open(paths[0], "r", encoding="utf-8") as f:
        header = [f.readline() for _ in range(2)]
    bp_line = header[1] if header[0].lower().startswith("scorer") else \
        header[0]
    cells = bp_line.strip().split(",")[1:]
    bodyparts = list(dict.fromkeys(c for c in cells if c))
    n_frames = max(int(idx.max()) for _, _, idx in tables) + 1
    C = len(tables)
    L = len(bodyparts)
    xy = np.full((n_frames, C, L, 2), np.nan)
    lik = np.zeros((n_frames, C, L))
    for c, (xy_t, lik_t, idx) in enumerate(tables):
        xy[idx, c] = xy_t
        lik[idx, c] = lik_t
    return xy, lik, bodyparts


# ---------------------------------------------------------------------------
# fte.pickle + reprojections
# ---------------------------------------------------------------------------

def save_fte_pickle(out_fpath: str, positions: np.ndarray, *, x, dx, ddx, q,
                    dq, ddq, com_pos, com_vel, tau: Dict, meas_err,
                    obj_cost: float, processing_time_s: float,
                    start_frame: int):
    """Write the reference's fte.pickle schema verbatim
    (acinoset_opt.py:330-361, acinoset_misc.py:1410-1419)."""
    payload = dict(
        positions=np.asarray(positions), x=np.asarray(x), dx=np.asarray(dx),
        ddx=np.asarray(ddx), q=np.asarray(q), dq=np.asarray(dq),
        ddq=np.asarray(ddq), com_pos=np.asarray(com_pos),
        com_vel=np.asarray(com_vel), tau=tau,
        meas_err=np.asarray(meas_err), obj_cost=obj_cost,
        processing_time_s=processing_time_s, start_frame=int(start_frame))
    os.makedirs(os.path.dirname(out_fpath), exist_ok=True)
    with open(out_fpath, "wb") as f:
        pickle.dump(payload, f)


def load_fte_pickle(fpath: str) -> Dict:
    with open(fpath, "rb") as f:
        return pickle.load(f)


def save_3d_cheetah_as_2d(positions_3d_arr: Sequence[np.ndarray],
                          out_dir: str, k_arr, d_arr, r_arr, t_arr,
                          cam_res, project_func, start_frame: int,
                          sync_offset_arr: Optional[List[int]] = None,
                          bodyparts: Sequence[str] = MARKERS,
                          out_fname: str = "fte",
                          save_as_csv: bool = True):
    """Per-camera 2D reprojection tables ``cam<i>_<out_fname>.h5/.csv`` in DLC
    format, out-of-frame points NaN (reference acinoset_misc.py:1346-1407)."""
    os.makedirs(out_dir, exist_ok=True)
    n_cams = len(k_arr)
    sync = sync_offset_arr or [0] * n_cams
    xyz_labels = ["x", "y", "likelihood"]
    pdindex = pd.MultiIndex.from_product([list(bodyparts), xyz_labels],
                                         names=["bodyparts", "coords"])
    for i in range(n_cams):
        pos3d = np.asarray(positions_3d_arr[i])
        n_frames = len(pos3d)
        proj = np.asarray(project_func(
            pos3d.reshape(-1, 3), k_arr[i], d_arr[i], r_arr[i],
            t_arr[i])).reshape(n_frames, -1, 2)
        oob = ((proj > np.asarray(cam_res)[None, None, :])
               | (proj < 0)).any(axis=2)
        proj = np.where(oob[..., None], np.nan, proj)
        data = np.full((n_frames, len(bodyparts), 3), np.nan)
        data[:, :, :2] = proj
        df = pd.DataFrame(data.reshape(n_frames, -1), columns=pdindex,
                          index=range(start_frame - sync[i],
                                      start_frame + n_frames - sync[i]))
        fpath = os.path.join(out_dir, f"cam{i + 1}_{out_fname}.h5")
        if save_as_csv:
            df.to_csv(os.path.splitext(fpath)[0] + ".csv")
        try:
            df.to_hdf(fpath, key=f"{out_fname}_df", format="table", mode="w")
        except ImportError:
            pass


def load_reprojection_table(fpath: str) -> pd.DataFrame:
    base, ext = os.path.splitext(fpath)
    if ext == ".h5":
        try:
            return pd.read_hdf(fpath)
        except ImportError:
            fpath = base + ".csv"
    return pd.read_csv(fpath, header=[0, 1], index_col=0)
