"""Device-side photometric augmentation for the staged training path.

The host pipeline (`data/augmentations.py`, mirroring the reference's
albumentations zoo, /root/reference/siclib/datasets/augmentations.py:277-349)
decodes + augments each image in loader workers. On the remote-TPU relay the
host<->device link is orders of magnitude slower than the chip, so the
staged trainer keeps the raw uint8 dataset resident in HBM and applies the
augmentations *inside the jitted train step* — one vectorized pass over the
whole batch, free next to the CNN forward.

Same op list + probabilities as the host `GeoCalibAugmentation`, with two
substitutions for host-codec ops that cannot run in XLA:

- JPEG round-trip (A.ImageCompression, p=1) -> luma quantization noise +
  the shared low-pass below (JPEG's loss = DCT-coefficient quantization,
  i.e. structured quantization noise concentrated at high frequencies).
- PIL multi-interp Downscale (p=1) -> random Gaussian low-pass whose sigma
  matches the anti-alias filter of the sampled scale factor.

Everything is branch-free (per-image bernoulli gates folded in with
`jnp.where`) so one executable covers every augmentation draw.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def _per_image(key, b: int, lo: float, hi: float) -> Array:
    """Uniform per-image scalar, broadcastable over (B,H,W,C)."""
    return jax.random.uniform(key, (b, 1, 1, 1), minval=lo, maxval=hi)


def _gate(key, b: int, p: float) -> Array:
    return (jax.random.uniform(key, (b, 1, 1, 1)) < p).astype(jnp.float32)


def _sep_blur(img: Array, sigma_x: Array, sigma_y: Array, radius: int = 4) -> Array:
    """Separable Gaussian blur with per-image sigmas (9-tap, 'same' pad).

    Implemented as two small einsum contractions over unfolded shifts —
    XLA fuses these into the surrounding elementwise work; no conv needed
    for a 9-tap kernel.
    """
    b = img.shape[0]
    taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)  # (T,)

    def kernel(sigma):  # (B,1,1,1) -> (B,T)
        s = jnp.maximum(sigma.reshape(b, 1), 1e-3)
        k = jnp.exp(-0.5 * (taps[None, :] / s) ** 2)
        return k / k.sum(-1, keepdims=True)

    kx, ky = kernel(sigma_x), kernel(sigma_y)
    pad = [(0, 0), (radius, radius), (radius, radius), (0, 0)]
    padded = jnp.pad(img, pad, mode="edge")
    h, w = img.shape[1], img.shape[2]
    # horizontal pass: gather T shifted views, weight by kx
    cols = jnp.stack(
        [padded[:, radius:-radius, t : t + w, :] for t in range(2 * radius + 1)], -1
    )  # (B,H,W,C,T)
    img = jnp.einsum("bhwct,bt->bhwc", cols, kx)
    padded = jnp.pad(img, pad, mode="edge")
    rows = jnp.stack(
        [padded[:, t : t + h, radius:-radius, :] for t in range(2 * radius + 1)], -1
    )
    return jnp.einsum("bhwct,bt->bhwc", rows, ky)


def device_augment(img: Array, rng: Array) -> Array:
    """GeoCalib augmentation pipeline on device; img (B,H,W,3) f32 in [0,1]."""
    b = img.shape[0]
    k = jax.random.split(rng, 24)
    blend = lambda gate, aug, orig: gate * aug + (1.0 - gate) * orig

    # ---- color ---- #
    # gamma p=0.8, range (0.8, 1.8)
    g = blend(_gate(k[0], b, 0.8), _per_image(k[1], b, 0.8, 1.8), 1.0)
    img = jnp.clip(img, 0.0, 1.0) ** g

    # tone curve p=0.5 (cubic bezier through jittered control points)
    low = jnp.clip(0.25 + 0.1 * jax.random.normal(k[2], (b, 1, 1, 1)), 0.0, 1.0)
    high = jnp.clip(0.75 + 0.1 * jax.random.normal(k[3], (b, 1, 1, 1)), 0.0, 1.0)
    t = jnp.clip(img, 0.0, 1.0)
    curved = 3 * (1 - t) ** 2 * t * low + 3 * (1 - t) * t**2 * high + t**3
    img = blend(_gate(k[4], b, 0.5), curved, img)

    # brightness/contrast p=0.5
    mean = img.mean((1, 2, 3), keepdims=True)
    bc = jnp.clip(
        (img - mean) * _per_image(k[5], b, 0.8, 1.2)
        + mean
        + _per_image(k[6], b, -0.2, 0.2),
        0.0,
        1.0,
    )
    img = blend(_gate(k[7], b, 0.5), bc, img)

    # color jitter p=0.4 (brightness/contrast/saturation/channel gains)
    cj = jnp.clip(img * _per_image(k[8], b, 0.8, 1.2), 0.0, 1.0)
    mean = cj.mean((1, 2, 3), keepdims=True)
    cj = jnp.clip((cj - mean) * _per_image(k[9], b, 0.8, 1.2) + mean, 0.0, 1.0)
    gray = cj.mean(-1, keepdims=True)
    cj = jnp.clip(gray + (cj - gray) * _per_image(k[10], b, 0.8, 1.2), 0.0, 1.0)
    gains = jax.random.uniform(k[11], (b, 1, 1, 3), minval=0.9, maxval=1.1)
    cj = jnp.clip(cj * gains, 0.0, 1.0)
    img = blend(_gate(k[12], b, 0.4), cj, img)

    # gray p=0.1 / sepia p=0.1 (disjoint draw)
    p = jax.random.uniform(k[13], (b, 1, 1, 1))
    gray3 = jnp.broadcast_to(img.mean(-1, keepdims=True), img.shape)
    sepia_m = jnp.asarray(
        [[0.393, 0.769, 0.189], [0.349, 0.686, 0.168], [0.272, 0.534, 0.131]]
    )
    sepia = jnp.clip(jnp.einsum("bhwc,dc->bhwd", img, sepia_m), 0.0, 1.0)
    img = jnp.where(p < 0.1, gray3, jnp.where(p < 0.2, sepia, img))

    # ---- noise ---- #
    # gaussian noise p=0.75, var 5..112 on the 0-255 scale
    sigma = jnp.sqrt(_per_image(k[14], b, 5.0, 112.0)) / 255.0
    noise = sigma * jax.random.normal(k[15], img.shape)
    img = jnp.clip(img + _gate(k[16], b, 0.75) * noise, 0.0, 1.0)

    # JPEG stand-in (always on, like A.ImageCompression p=1): luma
    # quantization to a random level count ~ quality 20..100
    levels = jnp.round(_per_image(k[17], b, 24.0, 200.0))
    img = jnp.clip(jnp.round(img * levels) / levels, 0.0, 1.0)

    # ISO noise p=0.5: luminance shot grain + zero-mean hue drift
    luma = jnp.einsum("bhwc,c->bhw", img, _LUMA)[..., None]
    intensity = _per_image(k[18], b, 0.1, 0.5)
    shot = jnp.sqrt(jnp.clip(luma, 0.0, 1.0) / 255.0) * jax.random.normal(
        k[19], luma.shape
    )
    shift = (
        _per_image(k[20], b, 0.01, 0.05)
        * intensity
        * jax.random.normal(k[21], (b, 1, 1, 3))
    )
    iso = jnp.clip(img + intensity * shot + (shift - shift.mean(-1, keepdims=True)), 0.0, 1.0)
    img = blend(_gate(k[22], b, 0.5), iso, img)

    # ---- blur / sharpen / downscale low-pass ---- #
    sub = jax.random.split(k[23], 6)
    # AdvancedBlur p=0.5 equivalent: sigma_x/y ~ U(0.2, 1.0)
    gate_blur = _gate(sub[0], b, 0.5)
    sx = blend(gate_blur, _per_image(sub[1], b, 0.2, 1.0), 1e-3)
    # Downscale(0.5..0.99) anti-alias equivalent: extra low-pass with
    # sigma = 0.5*sqrt(1/s^2 - 1) (always on, like the reference's p=1)
    s = _per_image(sub[2], b, 0.5, 0.99)
    sd = 0.5 * jnp.sqrt(1.0 / (s * s) - 1.0)
    sx_total = jnp.sqrt(sx**2 + sd**2)
    sy = jnp.sqrt(blend(gate_blur, _per_image(sub[3], b, 0.2, 1.0), 1e-3) ** 2 + sd**2)
    blurred = _sep_blur(img, sx_total, sy)
    # Sharpen p=0.25 (host: p=0.5 of a 0.5-gated sharpen)
    alpha = _gate(sub[4], b, 0.25) * _per_image(sub[5], b, 0.2, 0.5)
    img = jnp.clip(blurred + alpha * (img - blurred), 0.0, 1.0)
    return img


def device_augment_dark(img: Array, rng: Array) -> Array:
    """Low-light preset on device; img (B,H,W,3) f32 in [0,1].

    Device twin of `data/augmentations.DarkAugmentation` (the reference's
    "dark" preset, siclib/datasets/augmentations.py): gamma-crush the
    shadows, dim, then add sensor noise. Branch-free like device_augment.
    """
    b = img.shape[0]
    k = jax.random.split(rng, 4)
    gamma = _per_image(k[0], b, 1.5, 3.0)
    img = jnp.clip(img, 0.0, 1.0) ** gamma
    img = img * _per_image(k[1], b, 0.3, 0.7)
    sigma = _per_image(k[2], b, 0.01, 0.05)
    return jnp.clip(img + sigma * jax.random.normal(k[3], img.shape), 0.0, 1.0)


def device_augment_deepcalib(img: Array, rng: Array) -> Array:
    """DeepCalib training preset on device.

    The reference's "deepcalib" zoo (siclib/datasets/augmentations.py:253-274)
    is the geocalib photometric stack at similar probabilities plus
    per-pixel multiplicative noise (A.MultiplicativeNoise 0.85-1.15,
    elementwise, p=0.5); compose the existing pipeline with that stage.
    """
    b = img.shape[0]
    k_base, k_gate, k_mul = jax.random.split(rng, 3)
    img = device_augment(img, k_base)
    mul = jax.random.uniform(k_mul, img.shape, minval=0.85, maxval=1.15)
    return jnp.clip(img * jnp.where(_gate(k_gate, b, 0.5) > 0, mul, 1.0), 0.0, 1.0)


DEVICE_AUGMENTATIONS = {
    "identity": lambda img, rng: img,
    "geocalib": device_augment,
    "dark": device_augment_dark,
    "deepcalib": device_augment_deepcalib,
}


def augment_stats(img: Array, rng: Array) -> Tuple[Array, Array]:
    """Mean/std of the augmented batch (pinning hook for tests)."""
    out = device_augment(img, rng)
    return out.mean(), out.std()
