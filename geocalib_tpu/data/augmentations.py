"""Photometric augmentation pipelines (numpy, host-side).

Re-design of /root/reference/siclib/datasets/augmentations.py (albumentations
zoo) with a dependency-free numpy implementation of the same families:
gamma/tone jitter, brightness/contrast, hue-free color jitter, gaussian
noise, blur/sharpen, JPEG-ish degradation via downscale. Registry parity:
"geocalib", "dark", "default", "identity".
"""

from typing import Callable, Dict

import numpy as np

Array = np.ndarray


def _blur(img: Array, sigma: float) -> Array:
    """Separable gaussian blur with a small kernel."""
    radius = max(1, int(3 * sigma))
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    out = img
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 0, out)
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 1, out)
    return out


class Augmentation:
    """Base: a callable img (H, W, 3) float [0,1] → augmented image."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    def reseed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: Array) -> Array:
        raise NotImplementedError


class IdentityAugmentation(Augmentation):
    def __call__(self, img: Array) -> Array:
        return img


class DefaultAugmentation(Augmentation):
    """Mild photometric jitter (reference "default" pipeline)."""

    def __call__(self, img: Array) -> Array:
        rng = self.rng
        if rng.uniform() < 0.5:
            img = img ** rng.uniform(0.8, 1.25)  # gamma
        if rng.uniform() < 0.5:
            img = np.clip(img * rng.uniform(0.8, 1.2) + rng.uniform(-0.1, 0.1), 0, 1)
        if rng.uniform() < 0.5:
            scale = rng.uniform(0.9, 1.1, size=(1, 1, 3))
            img = np.clip(img * scale, 0, 1)
        return img.astype(np.float32)


class GeoCalibAugmentation(Augmentation):
    """Full training pipeline (reference "geocalib",
    augmentations.py:277-349): tone/color jitter + sensor noise + blur or
    sharpen + occasional downscale re-upscale."""

    def __call__(self, img: Array) -> Array:
        rng = self.rng
        # tone curve / gamma
        if rng.uniform() < 0.5:
            img = img ** rng.uniform(0.7, 1.4)
        # brightness/contrast
        if rng.uniform() < 0.5:
            mean = img.mean()
            img = np.clip(
                (img - mean) * rng.uniform(0.75, 1.25) + mean + rng.uniform(-0.15, 0.15),
                0,
                1,
            )
        # per-channel color jitter
        if rng.uniform() < 0.5:
            img = np.clip(img * rng.uniform(0.85, 1.15, (1, 1, 3)), 0, 1)
        # grayscale
        if rng.uniform() < 0.1:
            gray = img.mean(-1, keepdims=True)
            img = np.repeat(gray, 3, axis=-1)
        # sensor noise
        if rng.uniform() < 0.5:
            img = np.clip(img + rng.normal(0, rng.uniform(0.005, 0.03), img.shape), 0, 1)
        # blur OR sharpen
        p = rng.uniform()
        if p < 0.25:
            img = np.clip(_blur(img, rng.uniform(0.5, 1.5)), 0, 1)
        elif p < 0.5:
            blurred = _blur(img, 1.0)
            img = np.clip(img + rng.uniform(0.5, 1.5) * (img - blurred), 0, 1)
        # downscale degradation
        if rng.uniform() < 0.2:
            f = rng.uniform(0.5, 0.9)
            h, w = img.shape[:2]
            small = img[:: max(1, int(round(1 / f))), :: max(1, int(round(1 / f)))]
            ys = np.clip(
                (np.arange(h) * small.shape[0] / h).astype(int), 0, small.shape[0] - 1
            )
            xs = np.clip(
                (np.arange(w) * small.shape[1] / w).astype(int), 0, small.shape[1] - 1
            )
            img = small[ys][:, xs]
        return img.astype(np.float32)


class DarkAugmentation(Augmentation):
    """Low-light simulation (reference "dark")."""

    def __call__(self, img: Array) -> Array:
        rng = self.rng
        img = img ** rng.uniform(1.5, 3.0)  # crush shadows
        img = img * rng.uniform(0.3, 0.7)
        img = np.clip(img + rng.normal(0, rng.uniform(0.01, 0.05), img.shape), 0, 1)
        return img.astype(np.float32)


AUGMENTATIONS: Dict[str, Callable[..., Augmentation]] = {
    "identity": IdentityAugmentation,
    "default": DefaultAugmentation,
    "geocalib": GeoCalibAugmentation,
    "dark": DarkAugmentation,
}


def get_augmentation(name: str, seed: int = 0) -> Augmentation:
    try:
        return AUGMENTATIONS[name](seed=seed)
    except KeyError:
        raise ValueError(f"unknown augmentation {name!r}; options: {list(AUGMENTATIONS)}")
