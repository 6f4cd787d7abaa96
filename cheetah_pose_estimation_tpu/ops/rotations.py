"""Euler-angle rotation stacks (TPU-friendly, closed-form, batched).

The reference's rigid-body engine (``shared.physical_education``, reconstructed
from call sites — see SURVEY.md §2.4) parameterises every link orientation with
intrinsic z-y-x Euler angles (roll ``phi`` about x, pitch ``theta`` about y,
yaw ``psi`` about z), with body-to-inertial rotation

    ``R = Rz(psi) @ Ry(theta) @ Rx(phi)``.

This convention was verified to machine precision against the shipped
``fte.pickle`` artifacts (q -> positions pairs) of the reference's
``data/test_set``.

All functions broadcast over arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp


def euler_zyx(angles: jnp.ndarray) -> jnp.ndarray:
    """Body-to-inertial rotation matrix from (phi, theta, psi) Euler angles.

    Args:
      angles: (..., 3) array of (phi=roll, theta=pitch, psi=yaw).

    Returns:
      (..., 3, 3) rotation matrices ``Rz(psi) @ Ry(theta) @ Rx(phi)``.
    """
    phi, theta, psi = angles[..., 0], angles[..., 1], angles[..., 2]
    cf, sf = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    row0 = jnp.stack([cp * ct, cp * st * sf - sp * cf, cp * st * cf + sp * sf], axis=-1)
    row1 = jnp.stack([sp * ct, sp * st * sf + cp * cf, sp * st * cf - cp * sf], axis=-1)
    row2 = jnp.stack([-st, ct * sf, ct * cf], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_zyx_inverse(R: jnp.ndarray) -> jnp.ndarray:
    """(phi, theta, psi) Euler angles from R = Rz(psi) Ry(theta) Rx(phi).

    Standard extraction; valid away from the theta = +-pi/2 gimbal lock
    (the reference's own Euler parameterization shares the singularity, so
    its trajectories stay clear of it)."""
    theta = jnp.arctan2(-R[..., 2, 0],
                        jnp.sqrt(R[..., 0, 0]**2 + R[..., 1, 0]**2))
    phi = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    psi = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([phi, theta, psi], axis=-1)


def rot_y(theta: jnp.ndarray) -> jnp.ndarray:
    """(...,) -> (..., 3, 3) rotation about y."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, one, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1)], axis=-2)


def rot_z(psi: jnp.ndarray) -> jnp.ndarray:
    """(...,) -> (..., 3, 3) rotation about z."""
    c, s = jnp.cos(psi), jnp.sin(psi)
    z = jnp.zeros_like(psi)
    one = jnp.ones_like(psi)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, one], axis=-1)], axis=-2)


def euler_rate_to_body_omega(angles: jnp.ndarray) -> jnp.ndarray:
    """Map matrix E(angles) with ``omega_body = E @ [dphi, dtheta, dpsi]``.

    For R = Rz(psi) Ry(theta) Rx(phi), the body-frame angular velocity is

      omega_b = [dphi, 0, 0] + Rx(phi)^T [0, dtheta, 0]
                + (Ry(theta) Rx(phi))^T [0, 0, dpsi].

    Args:
      angles: (..., 3) Euler angles (phi, theta, psi).

    Returns:
      (..., 3, 3) matrices E.
    """
    phi, theta = angles[..., 0], angles[..., 1]
    cf, sf = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(phi)
    one = jnp.ones_like(phi)
    row0 = jnp.stack([one, z, -st], axis=-1)
    row1 = jnp.stack([z, cf, ct * sf], axis=-1)
    row2 = jnp.stack([z, -sf, ct * cf], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_rate_to_world_omega(angles: jnp.ndarray) -> jnp.ndarray:
    """Map matrix Ew with ``omega_world = Ew @ [dphi, dtheta, dpsi]``.

    omega_w = R @ omega_b; closed form:
      omega_w = dpsi * z_hat + dtheta * Rz(psi) y_hat + dphi * Rz(psi)Ry(theta) x_hat.
    """
    theta, psi = angles[..., 1], angles[..., 2]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    z = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    row0 = jnp.stack([cp * ct, -sp, z], axis=-1)
    row1 = jnp.stack([sp * ct, cp, z], axis=-1)
    row2 = jnp.stack([-st, z, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
