"""Up/latitude field ↔ classification-bin encodings (PerspectiveFields compat).

Re-design of /root/reference/siclib/models/utils/perspective_encoding.py in
jnp: used by the classification variants of the decoders.
"""

import jax.numpy as jnp

Array = jnp.ndarray


def encode_up_bin(vector_field: Array, num_bin: int) -> Array:
    """Up field (..., h, w, 2) → bin indices (..., h, w); last bin = invalid."""
    angle = (
        jnp.degrees(jnp.arctan2(vector_field[..., 1], vector_field[..., 0])) + 180.0
    ) % 360.0
    angle_bin = jnp.round(angle / (360.0 / (num_bin - 1))).astype(jnp.int32)
    angle_bin = jnp.where(angle_bin == num_bin - 1, 0, angle_bin)
    invalid = jnp.all(vector_field == 0, axis=-1)
    return jnp.where(invalid, num_bin - 1, angle_bin)


def decode_up_bin(angle_bin: Array, num_bin: int) -> Array:
    """Bin indices (..., h, w) → up field (..., h, w, 2); invalid bins → 0."""
    angle = jnp.radians(angle_bin * (360.0 / (num_bin - 1)) - 180.0)
    field = jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)
    invalid = (angle_bin == num_bin - 1)[..., None]
    return jnp.where(invalid, 0.0, field)


def encode_bin_latitude(latimap: Array, num_classes: int) -> Array:
    """Latitude map (radians) → bin indices in [0, num_classes)."""
    boundaries = jnp.arange(-90.0, 90.0, 180.0 / num_classes)[1:]
    return jnp.searchsorted(boundaries, jnp.degrees(latimap)).astype(jnp.int32)


def decode_bin_latitude(binmap: Array, num_classes: int) -> Array:
    """Bin indices → latitude map (radians, bin centers)."""
    bin_size = 180.0 / num_classes
    centers = jnp.arange(-90.0, 90.0, bin_size) + bin_size / 2.0
    return jnp.radians(centers[binmap])
