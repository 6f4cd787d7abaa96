"""FK and relative-pose parity against reference-shipped fte.pickle artifacts."""
import os
import pickle

import numpy as np
import pytest

from cheetah_pose_estimation_tpu.models import params as P
from cheetah_pose_estimation_tpu.models import skeleton as S

REF = "/root/reference/data/test_set"

CASES = [
    ("2019_03_07/phantom/run/fte_kinematic/fte.pickle", "phantom"),
    ("2019_03_07/phantom/run/fte_kinematic_1/fte.pickle", "phantom"),
    ("2017_08_29/top/jules/run1_2/fte_kinematic/fte.pickle", "jules"),
    ("2019_03_09/jules/flick1/fte_kinematic/fte.pickle", "jules"),
]


def _load(rel):
    path = os.path.join(REF, rel)
    if not os.path.exists(path):
        pytest.skip(f"reference artifact missing: {rel}")
    with open(path, "rb") as f:
        return pickle.load(f)


@pytest.mark.parametrize("rel,subject", CASES)
def test_fk_markers_match_reference(rel, subject):
    d = _load(rel)
    q = np.asarray(d["q"])
    pos = np.asarray(d["positions"])
    sp = P.get_subject(subject)
    ours = np.asarray(S.fk_markers(q, sp))
    assert ours.shape == pos.shape
    np.testing.assert_allclose(ours, pos, atol=1e-9)


@pytest.mark.parametrize("rel,subject", CASES[:2])
def test_relative_pose_match_reference(rel, subject):
    d = _load(rel)
    for key, out in (("q", "x"), ("dq", "dx"), ("ddq", "ddx")):
        got = np.asarray(S.relative_pose(np.asarray(d[key])))
        np.testing.assert_allclose(got, np.asarray(d[out]), atol=1e-9)


@pytest.mark.parametrize("rel,subject", CASES[:1])
def test_com_matches_reference(rel, subject):
    d = _load(rel)
    q = np.asarray(d["q"])
    sp = P.get_subject(subject)
    com = np.asarray(S.com_position(q, sp))
    np.testing.assert_allclose(com, np.asarray(d["com_pos"]), atol=1e-9)
    fps = 120.0  # 2019 trials run at 120 fps (acinoset_opt.py:483-487)
    vel = (com[1:] - com[:-1]) * fps
    np.testing.assert_allclose(vel, np.asarray(d["com_vel"]), atol=1e-7)


def test_fk_shapes_and_batching():
    sp = P.get_subject("acinoset")
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 7, 54))
    m = S.fk_markers(q, sp)
    assert m.shape == (5, 7, 24, 3)
    single = S.fk_markers(q[0, 0], sp)
    np.testing.assert_allclose(np.asarray(m[0, 0]), np.asarray(single),
                               atol=1e-12)


def test_relative_mask_counts():
    assert S.A_REL.shape == (28, 54)
    assert S.NX == 28
