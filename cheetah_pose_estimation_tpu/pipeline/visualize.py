"""3D skeleton visualization and animation export.

Counterpart of the reference's ``robot.animate()`` / ``robot.plot()``
(pe.system, driven from tests.ipynb cells 6-7) and the rendered
``data/video_results`` clips: draws the 17-link skeleton through its 24
markers, renders single poses or whole trajectories (mp4 when ffmpeg is
available, else animated-frame PDF/PNG sequences), and overlays
reconstructions for qualitative comparison.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..models.skeleton import MARKERS

_M = {name: i for i, name in enumerate(MARKERS)}

# marker-graph edges that trace the skeleton
SKELETON_EDGES = [
    ("nose", "r_eye"), ("nose", "l_eye"), ("r_eye", "neck_base"),
    ("l_eye", "neck_base"), ("neck_base", "spine"), ("spine", "tail_base"),
    ("tail_base", "tail1"), ("tail1", "tail2"),
    ("neck_base", "r_shoulder"), ("r_shoulder", "r_front_knee"),
    ("r_front_knee", "r_front_ankle"), ("r_front_ankle", "r_front_paw"),
    ("neck_base", "l_shoulder"), ("l_shoulder", "l_front_knee"),
    ("l_front_knee", "l_front_ankle"), ("l_front_ankle", "l_front_paw"),
    ("tail_base", "r_hip"), ("r_hip", "r_back_knee"),
    ("r_back_knee", "r_back_ankle"), ("r_back_ankle", "r_back_paw"),
    ("tail_base", "l_hip"), ("l_hip", "l_back_knee"),
    ("l_back_knee", "l_back_ankle"), ("l_back_ankle", "l_back_paw"),
]


def _axes3d(positions: np.ndarray):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 7), dpi=70)
    ax = fig.add_subplot(projection="3d")
    lo = positions.reshape(-1, 3).min(axis=0)
    hi = positions.reshape(-1, 3).max(axis=0)
    ctr = (lo + hi) / 2
    rng = float((hi - lo).max()) / 2 + 0.2
    ax.set_xlim(ctr[0] - rng, ctr[0] + rng)
    ax.set_ylim(ctr[1] - rng, ctr[1] + rng)
    ax.set_zlim(max(ctr[2] - rng, -0.1), ctr[2] + rng)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    return fig, ax


def _draw_pose(ax, pose: np.ndarray, color: str, label: Optional[str] = None):
    first = True
    for a, b in SKELETON_EDGES:
        p = pose[[_M[a], _M[b]]]
        ax.plot(p[:, 0], p[:, 1], p[:, 2], color=color,
                label=label if first else None, lw=1.5)
        first = False
    ax.scatter(pose[:, 0], pose[:, 1], pose[:, 2], color=color, s=6)


def plot_pose(positions: np.ndarray, out_path: str,
              overlay: Optional[np.ndarray] = None,
              labels: Sequence[str] = ("estimate", "reference")):
    """Render one (24, 3) pose (optionally overlaying a second)."""
    import matplotlib.pyplot as plt
    fig, ax = _axes3d(positions[None] if positions.ndim == 2 else positions)
    pose = positions if positions.ndim == 2 else positions[0]
    _draw_pose(ax, pose, "tab:blue", labels[0])
    if overlay is not None:
        _draw_pose(ax, overlay, "tab:orange", labels[1])
    ax.legend()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def animate(positions: np.ndarray, out_path: str, fps: float = 30.0,
            overlay: Optional[np.ndarray] = None,
            stride: int = 1) -> str:
    """Render a (N, 24, 3) marker trajectory to mp4 (ffmpeg) or a multi-page
    PDF fallback. Returns the written path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.animation as manim
    import matplotlib.pyplot as plt

    positions = np.asarray(positions)[::stride]
    fig, ax = _axes3d(positions)

    def draw(i):
        for artist in list(ax.lines) + list(ax.collections):
            artist.remove()
        _draw_pose(ax, positions[i], "tab:blue", "estimate")
        if overlay is not None:
            _draw_pose(ax, np.asarray(overlay)[::stride][i], "tab:orange",
                       "reference")
        return []

    anim = manim.FuncAnimation(fig, draw, frames=len(positions))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        anim.save(out_path, writer=manim.FFMpegWriter(fps=fps))
        written = out_path
    except (FileNotFoundError, RuntimeError):
        # no ffmpeg: multi-page pdf of every 5th frame
        from matplotlib.backends.backend_pdf import PdfPages
        written = os.path.splitext(out_path)[0] + ".pdf"
        with PdfPages(written) as pdf:
            for i in range(0, len(positions), 5):
                draw(i)
                pdf.savefig(fig)
    plt.close(fig)
    return written


def render_trial(fte_pickle_path: str, out_path: Optional[str] = None,
                 reference_pickle_path: Optional[str] = None,
                 fps: float = 30.0) -> str:
    """Animate a saved fte.pickle (optionally overlaying another solution) —
    the workflow behind the reference's data/video_results clips."""
    from ..data.io import load_fte_pickle

    d = load_fte_pickle(fte_pickle_path)
    overlay = None
    if reference_pickle_path:
        overlay = load_fte_pickle(reference_pickle_path)["positions"]
        n = min(len(overlay), len(d["positions"]))
        overlay = overlay[:n]
    out = out_path or os.path.join(os.path.dirname(fte_pickle_path),
                                   "animation.mp4")
    return animate(d["positions"], out, fps=fps, overlay=overlay)
