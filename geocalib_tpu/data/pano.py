"""Panorama → perspective-crop rendering (the dataset generator core).

Re-design of the reference pano renderer
(/root/reference/geocalib/camera.py:414-515): per output pixel, build the
camera ray, rotate it by gravity and yaw, convert to spherical lon/lat, and
bilinearly sample the equirectangular panorama. Pure jnp (runs batched on
any backend); the reference loops over yaws with host-side cv-style remap.

Also provides a procedural synthetic panorama so the full
generate→train→eval path runs in environments without downloaded panos
(this sandbox has no network egress; OpenPano must be fetched separately).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.utils.conversions import rad2rotmat

Array = jnp.ndarray


def _bilinear_sample(img: Array, x: Array, y: Array) -> Array:
    """Sample img (H, W, C) at float pixel coords x, y (N,) with clamping."""
    H, W = img.shape[:2]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]

    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def render_from_pano(
    pano: Array,
    camera: Camera,
    gravity: Gravity,
    yaw: Array = 0.0,
) -> Array:
    """Render perspective crops from an equirectangular panorama.

    Args:
        pano: (Hp, Wp, 3) float [0, 1] equirectangular image.
        camera: batched Camera (B,) — all entries must share width/height.
        gravity: batched Gravity (B,).
        yaw: scalar or (B,) yaw angles in radians.

    Returns:
        (B, h, w, 3) rendered crops.
    """
    B = camera.batch_shape[0]
    h = int(camera.size[0, 1])
    w = int(camera.size[0, 0])
    yaw = jnp.broadcast_to(jnp.asarray(yaw, jnp.float32), (B,))

    xy = camera.pixel_coordinates(h, w)
    uv1, _ = camera.image2world(xy)
    bearings = camera.pixel_bearing_many(uv1)  # (B, N, 3)

    zeros = jnp.zeros_like(yaw)
    R_yaw = rad2rotmat(zeros, zeros, yaw)  # (B, 3, 3)
    rotated = jnp.einsum("bni,bij,bjk->bnk", bearings, gravity.R, R_yaw)

    lon = jnp.arctan2(rotated[..., 0], rotated[..., 2])
    lat = jnp.arctan2(
        rotated[..., 1], jnp.linalg.norm(rotated[..., ::2], axis=-1)
    )

    Hp, Wp = pano.shape[:2]
    nx = (lon + jnp.pi) / (2 * jnp.pi) * (Wp - 1.0)
    ny = (lat + jnp.pi / 2) / jnp.pi * (Hp - 1.0)

    out = jax.vmap(lambda x, y: _bilinear_sample(pano, x, y))(nx, ny)
    return out.reshape(B, h, w, 3)


def synthetic_pano(
    seed: int = 0, height: int = 256, width: int = 512
) -> np.ndarray:
    """Procedural equirect panorama: sky/ground gradient + textured blocks.

    Gives the field networks real vanishing-line structure (horizon,
    vertical edges) without external data.
    """
    rng = np.random.default_rng(seed)
    lat = np.linspace(-np.pi / 2, np.pi / 2, height)[:, None]
    lon = np.linspace(-np.pi, np.pi, width)[None, :]

    # sky→ground gradient keyed on latitude (horizon at lat=0)
    sky = np.clip(lat / (np.pi / 2), 0, 1)
    ground = np.clip(-lat / (np.pi / 2), 0, 1)
    base = np.stack(
        [
            0.4 + 0.4 * sky + 0.25 * ground + 0 * lon,
            0.5 + 0.3 * sky + 0.2 * ground + 0 * lon,
            0.7 + 0.25 * sky + 0.05 * ground + 0 * lon,
        ],
        axis=-1,
    )

    # vertical "building" stripes with random colors and heights
    img = base.copy()
    for _ in range(rng.integers(8, 16)):
        lon0 = rng.uniform(-np.pi, np.pi)
        lon_w = rng.uniform(0.1, 0.6)
        top = rng.uniform(0.05, 0.6)  # angular height above horizon
        color = rng.uniform(0.1, 0.9, 3)
        mask = (
            (np.abs(((lon - lon0 + np.pi) % (2 * np.pi)) - np.pi) < lon_w / 2)
            & (lat > -0.5)
            & (lat < top)
        )
        # window texture
        tex = 0.5 + 0.5 * np.sin(lon * 40) * np.sin(lat * 40)
        img = np.where(mask[..., None], color * (0.7 + 0.3 * tex[..., None]), img)

    noise = rng.normal(0, 0.02, img.shape)
    return np.clip(img + noise, 0, 1).astype(np.float32)
