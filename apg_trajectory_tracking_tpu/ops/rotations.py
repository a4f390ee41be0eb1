"""Batched Euler-angle rotation helpers.

These are the JAX equivalents of the rotation utilities the reference keeps
on its dynamics base classes (``neural_control/dynamics/quad_dynamics_base.py:59-127``
and ``neural_control/dynamics/fixed_wing_dynamics.py:48-93``). They are written
component-wise (VPU-friendly elementwise math rather than tiny 3x3 matmuls)
and broadcast over arbitrary leading batch dimensions.

Conventions: attitude is ``[roll, pitch, yaw]`` Tait-Bryan ZYX.
"""

import jax.numpy as jnp


def world_to_body_matrix(attitude):
    """Rotation matrix taking world-frame vectors to the body frame.

    Mirrors ``Dynamics.world_to_body_matrix`` (quad_dynamics_base.py:59-94).

    Args:
        attitude: (..., 3) array of [roll, pitch, yaw].
    Returns:
        (..., 3, 3) rotation matrices.
    """
    roll, pitch, yaw = attitude[..., 0], attitude[..., 1], attitude[..., 2]
    Cy, Sy = jnp.cos(yaw), jnp.sin(yaw)
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)

    row0 = jnp.stack([Cy * Cp, Sy * Cp, -Sp], axis=-1)
    row1 = jnp.stack(
        [Cy * Sp * Sr - Cr * Sy, Cr * Cy + Sr * Sy * Sp, Cp * Sr], axis=-1
    )
    row2 = jnp.stack(
        [Cy * Sp * Cr + Sr * Sy, Cr * Sy * Sp - Cy * Sr, Cr * Cp], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_rate_matrix(attitude):
    """Matrix mapping body angular velocity -> Euler-angle rates.

    Mirrors ``Dynamics.to_euler_matrix`` (quad_dynamics_base.py:96-118).
    NOTE: this is the small-angle variant used by the quad dynamics (no
    tan/sec terms); the fixed-wing model uses the full matrix, see
    :func:`wing_euler_rate`.
    """
    roll, pitch = attitude[..., 0], attitude[..., 1]
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)
    one = jnp.ones_like(Sp)
    zero = jnp.zeros_like(Sp)

    row0 = jnp.stack([one, zero, -Sp], axis=-1)
    row1 = jnp.stack([zero, Cr, Cp * Sr], axis=-1)
    row2 = jnp.stack([zero, -Sr, Cp * Cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_rate(attitude, angular_velocity):
    """Euler-angle rates from body angular velocity (quad convention).

    Mirrors ``Dynamics.euler_rate`` (quad_dynamics_base.py:120-127).
    Component-wise expansion of the matrix product keeps everything on the
    VPU with no 3x3 matmul.
    """
    roll, pitch = attitude[..., 0], attitude[..., 1]
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)
    p = angular_velocity[..., 0]
    q = angular_velocity[..., 1]
    r = angular_velocity[..., 2]
    rate_roll = p - Sp * r
    rate_pitch = Cr * q + Cp * Sr * r
    rate_yaw = -Sr * q + Cp * Cr * r
    return jnp.stack([rate_roll, rate_pitch, rate_yaw], axis=-1)


def body_wind_matrix(alpha, beta):
    """Rotation from the wind frame to the body frame (fixed wing).

    Mirrors ``FixedWingDynamics.body_wind_function``
    (fixed_wing_dynamics.py:48-63).
    """
    sa, ca = jnp.sin(alpha), jnp.cos(alpha)
    sb, cb = jnp.sin(beta), jnp.cos(beta)
    zero = jnp.zeros_like(sa)
    row0 = jnp.stack([ca * cb, -ca * sb, -sa], axis=-1)
    row1 = jnp.stack([sb, cb, zero], axis=-1)
    row2 = jnp.stack([sa * cb, -sa * sb, ca], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inertial_to_body_matrix(phi, theta, psi):
    """ZYX rotation taking inertial-frame vectors to the body frame.

    This is the (untransposed) row-stack the reference builds inside
    ``FixedWingDynamics.inertial_body_function`` (fixed_wing_dynamics.py:65-92)
    before its final transpose.
    """
    sph, cph = jnp.sin(phi), jnp.cos(phi)
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    sps, cps = jnp.sin(psi), jnp.cos(psi)
    row0 = jnp.stack([cth * cps, cth * sps, -sth], axis=-1)
    row1 = jnp.stack(
        [-cph * sps + sph * sth * cps, cph * cps + sph * sth * sps, sph * cth],
        axis=-1,
    )
    row2 = jnp.stack(
        [sph * sps + cph * sth * cps, -sph * cps + cph * sth * sps, cph * cth],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def body_to_inertial_matrix(phi, theta, psi):
    """Rotation taking body-frame vectors to the inertial frame (R_ib).

    Equals ``FixedWingDynamics.inertial_body_function``'s return value
    (fixed_wing_dynamics.py:65-93), i.e. the transpose of
    :func:`inertial_to_body_matrix`.
    """
    m = inertial_to_body_matrix(phi, theta, psi)
    return jnp.swapaxes(m, -1, -2)


def mat_vec(matrix, vec):
    """Batched (..., 3, 3) @ (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", matrix, vec)
