"""Force-plate table IO (``grf/data_synth.h5`` / ``grf/data.h5``).

The reference writes these with pandas/pytables (``format="table"``,
key ``force_plate_data_df``, MultiIndex (force_plate, frame) x (Fx, Fy, Fz) —
acinoset_misc.py:940-943). pytables is not in this image, but the on-disk
layout is plain HDF5: a structured array at ``force_plate_data_df/table``
with fields (index, values_block_0[3], frame, force_plate). We read and
write that layout directly with h5py, staying interchange-compatible with
the reference's shipped artifacts.
"""
from __future__ import annotations

import os
from typing import Dict

import h5py
import numpy as np

KEY = "force_plate_data_df"


def save_force_plate_df(path: str, frames: Dict[int, np.ndarray]) -> None:
    """frames: {force_plate_index: (n_frames, 3) Fx,Fy,Fz}."""
    rows = []
    idx = 0
    for plate in sorted(frames):
        F = np.asarray(frames[plate], dtype=np.float64)
        for fr in range(F.shape[0]):
            rows.append((idx, F[fr], fr, plate))
            idx += 1
    dtype = np.dtype([("index", "<i8"), ("values_block_0", "<f8", (3,)),
                      ("frame", "<i8"), ("force_plate", "<i8")])
    table = np.array(rows, dtype=dtype)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        g = f.create_group(KEY)
        d = g.create_dataset("table", data=table)
        d.attrs["CLASS"] = np.bytes_(b"TABLE")
        d.attrs["NROWS"] = np.int64(len(table))
        for i, n in enumerate(("index", "values_block_0", "frame",
                               "force_plate")):
            d.attrs[f"FIELD_{i}_NAME"] = np.bytes_(n.encode())
    # csv sibling for human inspection
    with open(os.path.splitext(path)[0] + ".csv", "w") as f:
        f.write("force_plate,frame,Fx,Fy,Fz\n")
        for r in table:
            f.write(f"{r['force_plate']},{r['frame']},"
                    f"{r['values_block_0'][0]},{r['values_block_0'][1]},"
                    f"{r['values_block_0'][2]}\n")


def load_force_plate_df(path: str) -> Dict[int, np.ndarray]:
    """{force_plate_index: (n_frames, 3)} from a pandas-table-format HDF5."""
    with h5py.File(path, "r") as f:
        table = f[KEY]["table"][:]
    out: Dict[int, np.ndarray] = {}
    for plate in np.unique(table["force_plate"]):
        rows = table[table["force_plate"] == plate]
        order = np.argsort(rows["frame"])
        out[int(plate)] = rows["values_block_0"][order]
    return out
