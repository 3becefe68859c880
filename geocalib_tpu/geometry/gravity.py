"""Gravity direction in the camera frame, as an immutable pytree.

The gravity is a unit 3-vector; roll/pitch extraction and manifold updates
match /root/reference/geocalib/gravity.py (from_rp at :31-40, roll/pitch at
:63-97, update at :112-119), re-expressed as a flax.struct pytree so it can
flow through jit/vmap/scan untouched.
"""

from typing import Union

import jax.numpy as jnp
from flax import struct

from geocalib_tpu.geometry.manifolds import EuclideanManifold, SphericalManifold
from geocalib_tpu.utils.conversions import rad2rotmat

_EPS = 1e-4


@struct.dataclass
class Gravity:
    """Unit gravity vector (..., 3) in camera coordinates."""

    vec3d: jnp.ndarray  # (..., 3), unit norm

    @classmethod
    def from_vec3d(cls, vec: jnp.ndarray) -> "Gravity":
        """Create from an arbitrary 3-vector (will be normalized)."""
        vec = jnp.asarray(vec, dtype=jnp.result_type(vec, jnp.float32))
        norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
        return cls(vec3d=vec / jnp.maximum(norm, 1e-12))

    @classmethod
    def from_rp(cls, roll: Union[float, jnp.ndarray], pitch) -> "Gravity":
        """Gravity from roll & pitch: g = [-sin r cos p, -cos r cos p, sin p]."""
        roll = jnp.asarray(roll, dtype=jnp.float32)
        pitch = jnp.asarray(pitch, dtype=jnp.float32)
        sr, cr = jnp.sin(roll), jnp.cos(roll)
        sp, cp = jnp.sin(pitch), jnp.cos(pitch)
        return cls(vec3d=jnp.stack([-sr * cp, -cr * cp, sp], axis=-1))

    @property
    def x(self) -> jnp.ndarray:
        return self.vec3d[..., 0]

    @property
    def y(self) -> jnp.ndarray:
        return self.vec3d[..., 1]

    @property
    def z(self) -> jnp.ndarray:
        return self.vec3d[..., 2]

    @property
    def roll(self) -> jnp.ndarray:
        """Roll angle in radians, in (-π, π]."""
        s = jnp.clip(-self.x / (jnp.sqrt(jnp.maximum(1.0 - self.z**2, 0.0)) + _EPS), -1.0, 1.0)
        roll = jnp.arcsin(s)
        offset = -jnp.pi * jnp.sign(self.x)
        return jnp.where(self.y < 0, roll, -roll + offset)

    @property
    def pitch(self) -> jnp.ndarray:
        """Pitch angle in radians."""
        return jnp.arcsin(jnp.clip(self.z, -1.0, 1.0))

    @property
    def rp(self) -> jnp.ndarray:
        """(roll, pitch) stacked, shape (..., 2)."""
        return jnp.stack([self.roll, self.pitch], axis=-1)

    def J_rp(self) -> jnp.ndarray:
        """Jacobian d vec3d / d (roll, pitch), shape (..., 3, 2)."""
        cp, sp = jnp.cos(self.pitch), jnp.sin(self.pitch)
        cr, sr = jnp.cos(self.roll), jnp.sin(self.roll)
        zero = jnp.zeros_like(cp)
        J_roll = jnp.stack([-cr * cp, sr * cp, zero], axis=-1)
        J_pitch = jnp.stack([sr * sp, cr * sp, cp], axis=-1)
        return jnp.stack([J_roll, J_pitch], axis=-1)

    @property
    def R(self) -> jnp.ndarray:
        """Rotation matrix (..., 3, 3) aligning camera to gravity frame."""
        return rad2rotmat(roll=self.roll, pitch=self.pitch)

    def update(self, delta: jnp.ndarray, spherical: bool = False) -> "Gravity":
        """Apply a 2D tangent update on the selected manifold."""
        if spherical:
            return Gravity.from_vec3d(SphericalManifold.plus(self.vec3d, delta))
        rp = EuclideanManifold.plus(self.rp, delta)
        return Gravity.from_rp(rp[..., 0], rp[..., 1])

    def J_update(self, spherical: bool = False) -> jnp.ndarray:
        """Jacobian of the ⊞ update wrt the tangent delta, shape (..., 3, 2)."""
        return SphericalManifold.J_plus(self.vec3d) if spherical else self.J_rp()
