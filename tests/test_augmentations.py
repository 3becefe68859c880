"""Augmentation fidelity: per-op output statistics pinned.

VERDICT round-1 gap: the numpy augmentations were loose approximations with
no statistical checks. These tests pin the behavior of the new ops (real
JPEG round-trip, ISO noise, tone curve, multi-interp downscale) and the full
"geocalib" pipeline (reference op list: siclib/datasets/augmentations.py:
277-349).
"""

import numpy as np
import pytest

from geocalib_tpu.data.augmentations import (
    AUGMENTATIONS,
    downscale_upscale,
    get_augmentation,
    iso_noise,
    jpeg_compress,
    to_sepia,
    tone_curve,
)


@pytest.fixture()
def img():
    rng = np.random.default_rng(0)
    # smooth image + structure so JPEG/downscale have something to destroy
    y, x = np.mgrid[0:64, 0:64] / 64.0
    base = np.stack([x, y, 0.5 * (x + y)], -1).astype(np.float32)
    return np.clip(base + rng.uniform(-0.05, 0.05, base.shape), 0, 1).astype(
        np.float32
    )


def test_jpeg_quality_monotone(img):
    """Lower quality → strictly more reconstruction error; q=100 near-lossless."""
    errs = {
        q: float(np.abs(jpeg_compress(img, q) - img).mean()) for q in (20, 60, 100)
    }
    # q=100 still does 4:2:0 chroma subsampling in PIL → small nonzero error
    assert errs[100] < 0.03
    assert errs[20] > errs[60] > errs[100]
    assert errs[20] > 0.005  # q=20 visibly degrades


def test_iso_noise_scales_with_intensity(img):
    rng = np.random.default_rng(1)
    low = iso_noise(img, np.random.default_rng(2), 0.01, 0.1)
    high = iso_noise(img, np.random.default_rng(2), 0.05, 0.5)
    var_low = float(((low - img) ** 2).mean())
    var_high = float(((high - img) ** 2).mean())
    assert var_high > 5 * var_low > 0
    # noise level in the reference's regime (σ below ~0.1)
    assert np.sqrt(var_high) < 0.1
    del rng


def test_tone_curve_monotone_and_bounded(img):
    out = tone_curve(img, np.random.default_rng(3), scale=0.1)
    assert out.min() >= 0 and out.max() <= 1
    # monotone mapping on a ramp: sorted input stays sorted
    ramp = np.linspace(0, 1, 256, dtype=np.float32)[:, None, None] * np.ones(
        (1, 1, 3), np.float32
    )
    mapped = tone_curve(ramp, np.random.default_rng(3), scale=0.1)
    assert np.all(np.diff(mapped[:, 0, 0]) >= -1e-6)


def test_downscale_removes_high_freq(img):
    rng = np.random.default_rng(4)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    out = downscale_upscale(noisy, 0.5, ("box", "bilinear"))
    assert out.shape == noisy.shape

    def hf_energy(x):
        return float(np.abs(np.diff(x, axis=0)).mean() + np.abs(np.diff(x, axis=1)).mean())

    assert hf_energy(out) < 0.7 * hf_energy(noisy)


def test_sepia_tint(img):
    out = to_sepia(img)
    # sepia pushes red >= green >= blue on average
    assert out[..., 0].mean() >= out[..., 1].mean() >= out[..., 2].mean()


@pytest.mark.parametrize("name", sorted(AUGMENTATIONS))
def test_pipelines_shape_dtype_range(name, img):
    aug = get_augmentation(name, seed=0)
    out = aug(img)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_geocalib_pipeline_statistics(img):
    """The full pipeline perturbs without destroying the image: bounded mean
    shift, nonzero difference, reproducible under reseed."""
    aug = get_augmentation("geocalib", seed=0)
    diffs, means = [], []
    for s in range(8):
        aug.reseed(s)
        out = aug(img)
        diffs.append(float(np.abs(out - img).mean()))
        means.append(float(out.mean()))
    assert min(diffs) > 1e-4  # JPEG+downscale always change something
    assert max(diffs) < 0.5  # never unrecognizable
    assert abs(np.mean(means) - img.mean()) < 0.25
    aug.reseed(3)
    again = aug(img)
    aug.reseed(3)
    np.testing.assert_array_equal(again, aug(img))
