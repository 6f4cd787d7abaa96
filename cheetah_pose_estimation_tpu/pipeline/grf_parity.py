"""Force-accuracy validation against the reference's shipped kinetic
solutions (VERDICT r2 "Missing #2").

The reference ships fully solved physics trajectories for the five
force-plate trials: joint torques in ``fte_kinetic/fte.pickle`` (writer
``acinoset_opt.py:330-361``, per-motor ``Tc`` pyomo values in body-weight
units) and per-foot ground-reaction forces in ``fte_kinetic/cheetah.pickle``
(the pyomo variable dump: foot nodes carry ``GRFz (N,1)`` and ``GRFxy
(N,1,4)`` in body-weight units, friction-polygon directions ``foot.D``).
The raw force-plate measurements are NOT in the snapshot, so the shipped
solved forces are the only external force truth available — and they are a
strong one: the reference validated them against the plates
(``results.py:1416-1446``).

This module scores OUR force path directly against that truth: evaluate the
per-frame torque/GRF elimination (``solver.kinetic.KineticFTE.forces``) at
the REFERENCE'S OWN solved trajectory, with stance taken from the
reference's GRFz support, and compare the solved forces. Because the input
trajectory is identical, any disagreement isolates the dynamics model + force
solver (EOM terms, torque map, friction polygon, regularization) from
reconstruction differences.

Caveats recorded in the artifact: torque distribution across the 22 motors
at a fixed trajectory is regularization-dependent (the reference penalizes
``torque_squared`` through IPOPT, we ridge-regularize the per-frame
elimination), so tau agreement is reported but GRF — which is pinned by the
6 base rows of the EOM that no internal torque can touch — is the headline
parity metric.
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..dynamics import eom as dyn
from ..models import params as P
from ..utils.device import host_cpu

KINETIC_ROOT = "/root/reference/data/test_set/kinetic_dataset"
STANCE_THRESHOLD_BW = 1e-3   # reference GRFz support -> stance indicator


def kinetic_trial_dirs(root: str = KINETIC_ROOT) -> List[str]:
    out = []
    for d in sorted(glob.glob(os.path.join(root, "*", "*", "*"))):
        if os.path.exists(os.path.join(d, "fte_kinetic", "fte.pickle")):
            out.append(d)
    return out


def load_reference_kinetic_solution(trial_dir: str) -> Dict:
    """q (N,54), tau (N,22) in TORQUE_MAP column order, grf_z (N,4) and
    grf_xy (N,4,4) in FOOT_NAMES order, all body-weight units."""
    with open(os.path.join(trial_dir, "fte_kinetic", "fte.pickle"),
              "rb") as f:
        ref = pickle.load(f)
    with open(os.path.join(trial_dir, "fte_kinetic", "cheetah.pickle"),
              "rb") as f:
        chz = pickle.load(f)
    grf: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for link in chz["links"]:
        for node in link["nodes"]:
            if isinstance(node, dict) and "GRFz" in node:
                grf[node["name"]] = (np.asarray(node["GRFz"])[:, 0],
                                     np.asarray(node["GRFxy"])[:, 0, :])
    gz = np.stack([grf[n][0] for n in dyn.FOOT_NAMES], axis=1)
    gxy = np.stack([grf[n][1] for n in dyn.FOOT_NAMES], axis=1)
    # reference tau dict -> our TORQUE_MAP column order (component order
    # within a motor follows the axes sequence of build_torque_map, which
    # matches the reference's Tc_set ordering — verified names at
    # dynamics/eom.py:206-235)
    cols = []
    for nm in dyn.TORQUE_MAP.names:
        motor, ax = nm.rsplit(":", 1)
        arr = np.asarray(ref["tau"][motor])
        axes = [x.rsplit(":", 1)[1] for x in dyn.TORQUE_MAP.names
                if x.startswith(motor + ":")]
        cols.append(arr[:, axes.index(ax)])
    return dict(q=np.asarray(ref["q"], np.float64),
                tau=np.stack(cols, axis=1), grf_z=gz, grf_xy=gxy,
                start_frame=int(ref.get("start_frame", 0)))


def solve_forces_at(q: np.ndarray, stance: np.ndarray, subject_name: str,
                    fps: float = 200.0
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(tau (N,22), grf_z (N,4), grf_xy (N,4,4)) from OUR per-frame
    elimination at a given trajectory (body-weight units)."""
    import jax.numpy as jnp

    from ..solver import kinematic as kin
    from ..solver import kinetic as kn

    subject = P.get_subject(subject_name)
    N = q.shape[0]
    gmmp = kin.GMMPrior(np.zeros((1, 22)), np.eye(22)[None], np.zeros(1))
    ar = kin.ARAnchor(np.zeros((N, 28)), np.zeros(28), np.zeros(N))
    cam = kin.CameraSet(np.eye(3)[None], np.zeros((1, 4)), np.eye(3)[None],
                        np.zeros((1, 3)))
    base = kin.KinematicData(
        meas=np.zeros((N, 1, 24, 2, 1)), weight=np.zeros((N, 1, 24, 2, 1)),
        cam=cam, h=np.asarray(1.0 / fps), acc_weight=np.ones(54),
        frame_valid=np.ones(N), gmm=gmmp, ar=ar)
    kd = kn.KineticData(
        base=base, stance=jnp.asarray(stance),
        grf_fixed=jnp.zeros((N, 4)), grf_xy_fixed=jnp.zeros((N, 4, 4)),
        use_fixed_grf=jnp.asarray(0.0), q_warm=jnp.asarray(q),
        ground_z=jnp.asarray(0.0))
    fte = kn.KineticFTE(kn.KineticConfig(kinetic_dataset=True), subject)
    tau, gz, gxy = fte.forces(jnp.asarray(q), kd)
    return np.asarray(tau), np.asarray(gz), np.asarray(gxy)


# The 12 leg pitch (sagittal, about-y) motor columns: hip/knee/hock per
# leg. These drive the reference's gait-analysis torque curves
# (results.py:546-751) and are the torque channel with biomechanical truth.
_LEG_PITCH = tuple(i for i, nm in enumerate(dyn.TORQUE_MAP.names)
                   if ("hip-pitch" in nm
                       or ("_torque:y" in nm and nm[0] in "UL"
                           and nm[1] in "FB")))


def _stance_curve(x: np.ndarray, stance_col: np.ndarray,
                  n_pts: int = 50) -> Optional[np.ndarray]:
    """Longest contiguous stance window of a foot, resampled to n_pts
    (the reference's stance-normalized gait curves, results.py:546-620)."""
    # frames 0-1 are backward-difference boundary garbage — excluded here
    # exactly as in the RMSE columns (sl = slice(2, None)); a stance window
    # touching them would contaminate sagittal_curve_corr
    on = np.flatnonzero(stance_col > 0)
    on = on[on >= 2]
    if on.size < 4:
        return None
    splits = np.split(on, np.flatnonzero(np.diff(on) > 1) + 1)
    w = max(splits, key=len)
    if len(w) < 4:
        return None
    t = np.linspace(0, len(w) - 1, n_pts)
    return np.interp(t, np.arange(len(w)), x[w])


def grf_parity(out_csv: Optional[str] = "docs/artifacts/grf_parity.csv",
               root: str = KINETIC_ROOT, verbose: bool = True):
    """Per-trial force parity table vs the reference's solved physics.

    GRF columns: gz_rmse_bw (all frames x feet), stance_gz_rmse_bw (stance
    frames only), tot_grf_corr (total vertical force correlation over
    frames), peak_gz_[ours|ref]_bw. The first two frames are excluded
    (backward-difference derivative boundary).

    Torque columns, split by IDENTIFIABILITY: given the trajectory, the
    motor torques are recoverable by back-substitution leaf-to-root from
    the EOM rows — EXCEPT during stance, where the unknown contact force
    enters the same leg rows and the torque/GRF split is resolved only by
    each solver's regularization (the reference's torque_squared penalty
    through IPOPT vs our ridge-regularized per-frame elimination). So:
    ``tau_flight_rmse_bw`` scores frames with NO foot in stance (fully
    identifiable — the apples-to-apples number), ``tau_stance_rmse_bw``
    the rest (regularization-dependent, reported for completeness), and
    ``sagittal_curve_corr`` the shape correlation of the stance-normalized
    leg pitch-torque curves (hip/knee/hock per stance window, the
    reference's gait-analysis semantics, results.py:546-751) — shape is
    insensitive to how the regularizers distribute magnitude.
    """
    import pandas as pd

    rows = []
    with host_cpu():
        for tdir in kinetic_trial_dirs(root):
            name = "arabia" if "arabia" in tdir else "shiraz"
            ref = load_reference_kinetic_solution(tdir)
            stance = (ref["grf_z"] > STANCE_THRESHOLD_BW).astype(float)
            tau, gz, _ = solve_forces_at(ref["q"], stance, name)
            sl = slice(2, None)
            m = stance[sl] > 0
            d_gz = gz[sl] - ref["grf_z"][sl]
            tot, tot_ref = gz[sl].sum(1), ref["grf_z"][sl].sum(1)
            d_tau = tau[sl] - ref["tau"][sl]
            flight = stance[sl].sum(axis=1) == 0
            leg = np.asarray(_LEG_PITCH)
            # stance-normalized sagittal torque curve shape, per foot's
            # longest stance window, hip/knee/hock of that leg
            curve_corrs = []
            for f in range(4):
                for j in range(3):       # hip, knee, hock of leg f
                    col = leg[3 * f + j]
                    a = _stance_curve(tau[:, col], stance[:, f])
                    b = _stance_curve(ref["tau"][:, col], stance[:, f])
                    if a is None or b is None or np.std(a) < 1e-9 \
                            or np.std(b) < 1e-9:
                        continue
                    curve_corrs.append(float(np.corrcoef(a, b)[0, 1]))
            rows.append(dict(
                trial=os.path.relpath(tdir, root), n_frames=len(ref["q"]),
                gz_rmse_bw=float(np.sqrt(np.mean(d_gz ** 2))),
                stance_gz_rmse_bw=float(np.sqrt(np.mean(d_gz[m] ** 2)))
                if m.any() else np.nan,
                tot_grf_corr=float(np.corrcoef(tot, tot_ref)[0, 1]),
                peak_gz_ours_bw=float(gz.max()),
                peak_gz_ref_bw=float(ref["grf_z"].max()),
                tau_rmse_bw=float(np.sqrt(np.mean(d_tau ** 2))),
                tau_ref_rms_bw=float(np.sqrt(np.mean(ref["tau"][sl] ** 2))),
                tau_flight_rmse_bw=float(np.sqrt(np.mean(
                    d_tau[flight] ** 2))) if flight.any() else np.nan,
                tau_flight_ref_rms_bw=float(np.sqrt(np.mean(
                    ref["tau"][sl][flight] ** 2)))
                if flight.any() else np.nan,
                tau_stance_rmse_bw=float(np.sqrt(np.mean(
                    d_tau[~flight] ** 2))) if (~flight).any() else np.nan,
                sagittal_curve_corr=float(np.mean(curve_corrs))
                if curve_corrs else np.nan,
                n_stance_curves=len(curve_corrs),
            ))
            if verbose:
                r = rows[-1]
                print(f"[grf_parity] {r['trial']}: gz_rmse={r['gz_rmse_bw']:.3f} "
                      f"corr={r['tot_grf_corr']:.3f} "
                      f"tau_flight={r['tau_flight_rmse_bw']:.3f} "
                      f"curve_corr={r['sagittal_curve_corr']:.3f}")
    df = pd.DataFrame(rows)
    if out_csv:
        os.makedirs(os.path.dirname(out_csv), exist_ok=True)
        df.to_csv(out_csv, index=False)
    return df
