"""Camera model parity against OpenCV (the reference's numeric backend)."""
import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from cheetah_pose_estimation_tpu.ops import camera as cam


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[760.0, 0.0, 960.0], [0.0, 760.0, 540.0], [0.0, 0.0, 1.0]])
    D = np.array([-0.04, 0.01, -0.005, 0.001])
    rvec = rng.normal(size=3) * 0.3
    R = cv.Rodrigues(rvec)[0]
    t = np.array([0.5, -0.2, 6.0])
    pts = rng.normal(size=(40, 3)) * np.array([2.0, 2.0, 0.5]) + np.array(
        [0.0, 0.0, 0.4])
    return K, D, R, t, pts


def test_project_fisheye_matches_cv2():
    K, D, R, t, pts = _scene()
    ours = np.asarray(cam.project_fisheye(pts, K, D, R, t))
    rvec = cv.Rodrigues(R)[0]
    ref = cv.fisheye.projectPoints(
        pts.reshape((-1, 1, 3)), rvec, t.reshape(3, 1), K,
        D.reshape(4, 1))[0].reshape((-1, 2))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_undistort_fisheye_roundtrip_cv2():
    K, D, R, t, pts = _scene(1)
    uv = np.asarray(cam.project_fisheye(pts, K, D, R, t))
    ab = np.asarray(cam.undistort_fisheye(uv, K, D))
    ref = cv.fisheye.undistortPoints(
        uv.reshape((-1, 1, 2)).astype(np.float64), K,
        D.reshape(4, 1)).reshape((-1, 2))
    np.testing.assert_allclose(ab, ref, rtol=0, atol=1e-8)
    # roundtrip: distort(ab) -> pixels
    uv2 = np.asarray(cam._apply_K(cam.distort_fisheye(ab, D), K))
    np.testing.assert_allclose(uv2, uv, rtol=0, atol=1e-8)


def test_pinhole_project_and_undistort_roundtrip():
    K, _, R, t, pts = _scene(2)
    D = np.array([-0.2, 0.05, 0.002, 0.0])
    uv = np.asarray(cam.project_pinhole(pts, K, D, R, t))
    ab = np.asarray(cam.undistort_pinhole(uv, K, D))
    Xc = (R @ pts.T).T + t
    np.testing.assert_allclose(ab, Xc[:, :2] / Xc[:, 2:3], rtol=0, atol=1e-9)


def test_triangulate_dlt_recovers_points():
    K, D, R1, t1, pts = _scene(3)
    R2 = cv.Rodrigues(np.array([0.1, 0.5, -0.2]))[0]
    t2 = np.array([-1.0, 0.3, 6.5])
    uv1 = np.asarray(cam.project_fisheye(pts, K, D, R1, t1))
    uv2 = np.asarray(cam.project_fisheye(pts, K, D, R2, t2))
    ab1 = np.asarray(cam.undistort_fisheye(uv1, K, D))
    ab2 = np.asarray(cam.undistort_fisheye(uv2, K, D))
    X = np.asarray(cam.triangulate_dlt(ab1, ab2, R1, t1, R2, t2))
    np.testing.assert_allclose(X, pts, rtol=0, atol=1e-6)

    # also match cv2.triangulatePoints on the same normalized inputs
    P1 = np.hstack([R1, t1.reshape(3, 1)])
    P2 = np.hstack([R2, t2.reshape(3, 1)])
    Xh = cv.triangulatePoints(P1, P2, ab1.T, ab2.T)
    ref = (Xh[:3] / Xh[3]).T
    np.testing.assert_allclose(X, ref, rtol=0, atol=1e-6)


def test_backproject_to_distance():
    K, D, R, t, pts = _scene(4)
    Xc = (R @ pts.T).T + t
    ab = Xc[:, :2] / Xc[:, 2:3]
    for i in range(5):
        X = np.asarray(cam.backproject_to_distance(ab[i], float(Xc[i, 2]), R, t))
        np.testing.assert_allclose(X, pts[i], rtol=0, atol=1e-9)
