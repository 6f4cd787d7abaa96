import numpy as np

from cheetah_pose_estimation_tpu.ops import rotations as rot


def _num_domega(angles, dangles, eps=1e-6):
    """Finite-difference world angular velocity via dR/dt R^T."""
    R0 = np.asarray(rot.euler_zyx(angles - eps / 2 * dangles))
    R1 = np.asarray(rot.euler_zyx(angles + eps / 2 * dangles))
    dR = (R1 - R0) / eps
    W = dR @ np.asarray(rot.euler_zyx(angles)).T
    return np.array([W[2, 1], W[0, 2], W[1, 0]])


def test_euler_zyx_orthonormal():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(100, 3))
    R = np.asarray(rot.euler_zyx(a))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_euler_zyx_axis_decomposition():
    # pure yaw rotates x into y
    R = np.asarray(rot.euler_zyx(np.array([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    # pure pitch rotates x into -z
    R = np.asarray(rot.euler_zyx(np.array([0.0, np.pi / 2, 0.0])))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 0, -1], atol=1e-12)
    # pure roll rotates y into z
    R = np.asarray(rot.euler_zyx(np.array([np.pi / 2, 0.0, 0.0])))
    np.testing.assert_allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-12)


def test_omega_maps_consistent():
    rng = np.random.default_rng(2)
    for _ in range(20):
        a = rng.normal(size=3)
        da = rng.normal(size=3)
        omega_w = np.asarray(rot.euler_rate_to_world_omega(a)) @ da
        omega_b = np.asarray(rot.euler_rate_to_body_omega(a)) @ da
        R = np.asarray(rot.euler_zyx(a))
        np.testing.assert_allclose(omega_w, R @ omega_b, atol=1e-12)
        np.testing.assert_allclose(omega_w, _num_domega(a, da), rtol=0,
                                   atol=1e-5)
