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
    host and device pipelines over many draws (64 draws each; the r3
    advisor flagged the 16-draw 0.3-3.0x bound as too loose to catch a
    train/eval domain gap)."""
    host_diffs, host_means = [], []
    aug = get_augmentation("geocalib", seed=0)
    for s in range(64):
        aug.reseed(s)
        out = aug(img)
        host_diffs.append(float(np.abs(out - img).mean()))
        host_means.append(float(out.mean()))

    batch = jnp.tile(jnp.asarray(img)[None], (64, 1, 1, 1))
    dev = np.asarray(jax.jit(device_augment)(batch, jax.random.PRNGKey(0)))
    dev_diffs = np.abs(dev - img[None]).mean(axis=(1, 2, 3))
    dev_means = dev.mean(axis=(1, 2, 3))

    # same scale of perturbation, no degenerate identity
    assert 0.5 < np.mean(dev_diffs) / np.mean(host_diffs) < 2.0, (
        np.mean(dev_diffs), np.mean(host_diffs))
    assert dev_diffs.min() > 1e-4
    assert dev_diffs.max() < 0.5
    # both keep global brightness roughly centered
    assert abs(np.mean(dev_means) - img.mean()) < 0.25
    # and the spread of perturbation strengths overlaps (not just the mean):
    # compare interquartile ranges on a log scale
    hq1, hq3 = np.percentile(host_diffs, [25, 75])
    dq1, dq3 = np.percentile(dev_diffs, [25, 75])
    assert dq1 < hq3 * 2.0 and hq1 < dq3 * 2.0, (
        (hq1, hq3), (dq1, dq3))


def test_device_blur_mtf_matches_host(img):
    """Per-op check (r3 advisor): the Downscale stand-in's transfer at a
    known spatial frequency must sit in the same range as the host op's.

    Probes with a pure horizontal grating and measures how much of that
    frequency survives each pipeline (median over draws, so the stochastic
    noise/tone ops average out)."""
    f = 8  # cycles over the 64-px image: inside both pipelines' blur band
    y, x = np.mgrid[0:64, 0:64]
    grating = (0.5 + 0.25 * np.sin(2 * np.pi * f * x / 64.0)).astype(np.float32)
    probe = np.repeat(grating[..., None], 3, axis=-1)

    def amplitude(a):
        # projection onto the probe frequency along x, averaged over rows
        ref = np.sin(2 * np.pi * f * np.arange(64) / 64.0)
        return float(np.abs((a.mean(-1) * ref[None, :]).mean()))

    a0 = amplitude(probe)
    host_amp = []
    aug = get_augmentation("geocalib", seed=0)
    for s in range(32):
        aug.reseed(s)
        host_amp.append(amplitude(aug(probe)) / a0)
    batch = jnp.tile(jnp.asarray(probe)[None], (32, 1, 1, 1))
    dev = np.asarray(jax.jit(device_augment)(batch, jax.random.PRNGKey(3)))
    dev_amp = [amplitude(dev[i]) / a0 for i in range(32)]

    h_med, d_med = np.median(host_amp), np.median(dev_amp)
    assert 0.5 < d_med / h_med < 2.0, (h_med, d_med)


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


def test_preset_registry(img):
    """The named device presets: identity is exact, dark darkens (it is the
    host DarkAugmentation's gamma-crush + dim + noise), deepcalib adds
    multiplicative noise on top of the geocalib stack."""
    from geocalib_tpu.data.device_augment import DEVICE_AUGMENTATIONS

    batch = jnp.stack([jnp.asarray(img)] * 4)
    key = jax.random.PRNGKey(7)
    outs = {}
    for name, fn in DEVICE_AUGMENTATIONS.items():
        out = fn(batch, key)
        assert out.shape == batch.shape and bool(jnp.isfinite(out).all()), name
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0, name
        outs[name] = out
    assert jnp.array_equal(outs["identity"], batch)
    # dark: mean over several draws clearly below the input mean
    means = [
        float(DEVICE_AUGMENTATIONS["dark"](batch, jax.random.PRNGKey(i)).mean())
        for i in range(8)
    ]
    assert max(means) < float(batch.mean()) * 0.8
    assert not jnp.array_equal(outs["deepcalib"], outs["geocalib"])


def test_sample_batch_accepts_preset_names(img):
    """sample_batch's augment arg: True/False aliases plus preset strings."""
    from geocalib_tpu.training.device_store import sample_batch

    store = jnp.stack([jnp.asarray(img * 255, jnp.uint8)] * 6)
    params = jnp.arange(6 * 4, dtype=jnp.float32).reshape(6, 4)
    key = jax.random.PRNGKey(3)
    b_false = sample_batch(store, params, key, 4, augment=False)
    b_ident = sample_batch(store, params, key, 4, augment="identity")
    assert jnp.array_equal(b_false["image"], b_ident["image"])
    b_true = sample_batch(store, params, key, 4, augment=True)
    b_geo = sample_batch(store, params, key, 4, augment="geocalib")
    assert jnp.array_equal(b_true["image"], b_geo["image"])
    b_dark = sample_batch(store, params, key, 4, augment="dark")
    assert float(b_dark["image"].mean()) < float(b_false["image"].mean())
