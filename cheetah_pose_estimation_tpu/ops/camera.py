"""Camera models: pinhole + equidistant fisheye, pure JAX.

Replaces the reference's dual projection stack — symbolic Pyomo expressions
(``acinoset_misc.py:1663-1696``) for in-solver constraints and OpenCV calls
(``acinoset_misc.py:1332-1343,1422-1453``) for numeric output — with a single
differentiable implementation used both inside the jitted residual and for
artifact generation.

Conventions (match OpenCV): world point X maps to camera frame x_c = R X + t;
normalized coords a = x/z, b = y/z; intrinsics K (3x3, zero skew used);
distortion D:

* fisheye (AcinoSet cameras): theta = atan(r),
  theta_d = theta (1 + d0 th^2 + d1 th^4 + d2 th^6 + d3 th^8),
  uv = K @ [a th_d/r, b th_d/r, 1]   — identical to cv2.fisheye.
* pinhole (2009 kinetic dataset): radial-only polynomial
  (1 + d0 r^2 + d1 r^4 + d2 r^6) exactly as the reference's symbolic
  ``pt3d_to_2d`` (the reference feeds the same 4-vector to cv2.projectPoints,
  which reinterprets d[2:] as tangential terms; we follow the symbolic model,
  which is what its solver optimised against).

All functions broadcast over leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def world_to_cam(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """X (..., 3) world -> camera frame. R (3,3), t (3,) or (3,1)."""
    t = jnp.reshape(t, (3,))
    return jnp.einsum("ij,...j->...i", R, X) + t


def _normalized(Xc: jnp.ndarray) -> jnp.ndarray:
    return Xc[..., :2] / Xc[..., 2:3]


def distort_fisheye(ab: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Apply equidistant distortion to normalized coords ab (..., 2)."""
    D = jnp.reshape(D, (-1,))
    a, b = ab[..., 0], ab[..., 1]
    r = jnp.sqrt(a * a + b * b)
    th = jnp.arctan(r)
    th2 = th * th
    th_d = th * (1 + D[0] * th2 + D[1] * th2**2 + D[2] * th2**3
                 + D[3] * th2**4)
    scale = th_d / (r + 1e-12)
    return ab * scale[..., None]


def distort_pinhole(ab: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Radial polynomial distortion (matches reference pt3d_to_2d)."""
    D = jnp.reshape(D, (-1,))
    r2 = jnp.sum(ab * ab, axis=-1)
    d = 1 + D[0] * r2 + D[1] * r2**2 + D[2] * r2**3
    return ab * d[..., None]


def _apply_K(xy: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def project_fisheye(X: jnp.ndarray, K, D, R, t) -> jnp.ndarray:
    """World points (..., 3) -> pixel coords (..., 2), fisheye model."""
    ab = _normalized(world_to_cam(X, R, t))
    return _apply_K(distort_fisheye(ab, D), K)


def project_pinhole(X: jnp.ndarray, K, D, R, t) -> jnp.ndarray:
    """World points (..., 3) -> pixel coords (..., 2), pinhole model."""
    ab = _normalized(world_to_cam(X, R, t))
    return _apply_K(distort_pinhole(ab, D), K)


def _unapply_K(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], axis=-1)


def undistort_fisheye(uv: jnp.ndarray, K, D, iters: int = 20) -> jnp.ndarray:
    """Pixel coords -> undistorted normalized coords (cv2.fisheye.undistortPoints).

    Solves theta from theta_d = theta (1 + d0 th^2 + ...) by Newton iteration.
    """
    D = jnp.reshape(D, (-1,))
    xy = _unapply_K(uv, K)
    th_d = jnp.sqrt(jnp.sum(xy * xy, axis=-1))

    def f(th):
        th2 = th * th
        return th * (1 + D[0] * th2 + D[1] * th2**2 + D[2] * th2**3
                     + D[3] * th2**4)

    df = jax.grad(lambda s: jnp.sum(f(s)))

    def body(_, th):
        return th - (f(th) - th_d) / df(th)

    th = jax.lax.fori_loop(0, iters, body, th_d)
    scale = jnp.tan(th) / jnp.where(th_d > 1e-12, th_d, 1.0)
    return xy * jnp.where(th_d > 1e-12, scale, 1.0)[..., None]


def undistort_pinhole(uv: jnp.ndarray, K, D, iters: int = 20) -> jnp.ndarray:
    """Pixel coords -> undistorted normalized coords (radial model)."""
    D = jnp.reshape(D, (-1,))
    xy_d = _unapply_K(uv, K)

    def body(_, xy):
        r2 = jnp.sum(xy * xy, axis=-1)
        d = 1 + D[0] * r2 + D[1] * r2**2 + D[2] * r2**3
        return xy_d / d[..., None]

    return jax.lax.fori_loop(0, iters, body, xy_d)


def triangulate_dlt(ab1: jnp.ndarray, ab2: jnp.ndarray, R1, t1, R2,
                    t2) -> jnp.ndarray:
    """Two-view DLT triangulation from undistorted normalized coords.

    Equivalent to cv2.triangulatePoints on P = [R | t]
    (reference ``acinoset_misc.py:1432-1453``).

    Args:
      ab1, ab2: (..., 2) normalized image coords in each view.
    Returns:
      (..., 3) world points.
    """
    P1 = jnp.concatenate([R1, jnp.reshape(t1, (3, 1))], axis=1)
    P2 = jnp.concatenate([R2, jnp.reshape(t2, (3, 1))], axis=1)
    rows = [
        ab1[..., 0, None] * P1[2] - P1[0],
        ab1[..., 1, None] * P1[2] - P1[1],
        ab2[..., 0, None] * P2[2] - P2[0],
        ab2[..., 1, None] * P2[2] - P2[1],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # homogeneous solution: right singular vector of smallest singular value
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[..., -1, :]
    return Xh[..., :3] / Xh[..., 3:4]


def backproject_to_distance(ab: jnp.ndarray, dist: float, R, t) -> jnp.ndarray:
    """Single-view ray init: normalized coords at camera-frame depth ``dist``
    mapped to world (reference ``triangulate_points_single_img``,
    ``acinoset_misc.py:1422-1429``)."""
    ones = jnp.ones_like(ab[..., :1])
    Xc = dist * jnp.concatenate([ab, ones], axis=-1)
    t = jnp.reshape(t, (3,))
    return jnp.einsum("ji,...j->...i", R, Xc) - jnp.einsum("ji,j->i", R, t)
