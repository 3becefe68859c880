"""Angle / focal-length / rotation conversions (pure jnp).

Functional parity with the reference conversions
(/root/reference/geocalib/utils.py:232-299), re-expressed as stateless jnp
functions that broadcast over arbitrary batch shapes.
"""

import jax.numpy as jnp


def rad2deg(rad: jnp.ndarray) -> jnp.ndarray:
    """Convert radians to degrees."""
    return rad * (180.0 / jnp.pi)


def deg2rad(deg: jnp.ndarray) -> jnp.ndarray:
    """Convert degrees to radians."""
    return deg * (jnp.pi / 180.0)


def fov2focal(fov: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Focal length (pixels) from field of view (radians) and image size (pixels)."""
    return size / 2.0 / jnp.tan(fov / 2.0)


def focal2fov(focal: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Field of view (radians) from focal length and image size (pixels)."""
    return 2.0 * jnp.arctan(size / (2.0 * focal))


def pitch2rho(pitch: jnp.ndarray, f: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Distance from principal point to horizon, normalized by image height."""
    return jnp.tan(pitch) * f / h


def rho2pitch(rho: jnp.ndarray, f: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Pitch angle from normalized distance to horizon."""
    return jnp.arctan(rho * h / f)


def skew_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix (..., 3, 3) from vector (..., 3)."""
    z = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [z, -v[..., 2], v[..., 1], v[..., 2], z, -v[..., 0], -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return rows.reshape(v.shape[:-1] + (3, 3))


def rad2rotmat(roll: jnp.ndarray, pitch: jnp.ndarray, yaw=None) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) from roll/pitch/yaw (radians).

    Matches the reference convention R = Rz(roll) @ Rx(pitch) @ Ry(yaw)
    (/root/reference/geocalib/utils.py:232-269).
    """
    roll = jnp.asarray(roll)
    pitch = jnp.asarray(pitch)
    yaw = jnp.zeros_like(roll) if yaw is None else jnp.asarray(yaw)

    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cr, sr = jnp.cos(roll), jnp.sin(roll)

    one = jnp.ones_like(cp)
    zero = jnp.zeros_like(cp)

    rx = jnp.stack(
        [one, zero, zero, zero, cp, sp, zero, -sp, cp], axis=-1
    ).reshape(pitch.shape + (3, 3))
    ry = jnp.stack(
        [cy, zero, -sy, zero, one, zero, sy, zero, cy], axis=-1
    ).reshape(yaw.shape + (3, 3))
    rz = jnp.stack(
        [cr, sr, zero, -sr, cr, zero, zero, zero, one], axis=-1
    ).reshape(roll.shape + (3, 3))

    return rz @ rx @ ry
