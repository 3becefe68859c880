"""End-to-end GeoCalib.calibrate(): single, batched, priors, shared
intrinsics (extractor.py) — the exact configurations the conditioned
accuracy table (tools/eval_conditioned.py) evaluates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.extractor import GeoCalib
from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.perspective_fields import get_perspective_field
from geocalib_tpu.utils.image import ImagePreprocessor


@pytest.fixture(scope="module")
def calib():
    c = GeoCalib(variant="tiny", compute_dtype="float32")
    c.preprocessor = ImagePreprocessor(resize=64)
    return c


def _image(b=4, size=64):
    return np.asarray(
        jax.random.uniform(jax.random.PRNGKey(0), (b, size, size, 3), jnp.float32)
    )


def test_calibrate_single_image(calib):
    out = calib.calibrate(_image(1)[0])
    assert np.isfinite(float(out["camera"].vfov))
    assert np.isfinite(float(out["gravity"].roll))
    assert out["up_field"].shape == (64, 64, 2)


def test_calibrate_batched_and_shared_intrinsics(calib):
    img = _image(4)
    single = calib.calibrate(img, batched=True)
    shared = calib.calibrate(img, batched=True, shared_intrinsics=True)
    assert single["camera"].vfov.shape == (4,)
    # shared intrinsics: ONE focal across the batch
    f = np.asarray(shared["camera"].f)
    np.testing.assert_allclose(f, np.broadcast_to(f[:1], f.shape), rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(shared["gravity"].rp)))


def test_calibrate_with_priors(calib):
    img = _image(2)
    f_px = 64.0 / 2.0 / np.tan(0.5)
    grav = Gravity.from_rp(jnp.asarray([0.1, -0.2]), jnp.asarray([0.05, 0.3]))
    out_f = calib.calibrate(img, batched=True, priors={"focal": f_px})
    out_g = calib.calibrate(img, batched=True, priors={"gravity": grav.vec3d})
    # focal prior pins the focal near the prior value
    assert np.allclose(np.asarray(out_f["camera"].f), f_px, rtol=0.2)
    # gravity prior pulls roll/pitch toward the prior
    rp = np.asarray(out_g["gravity"].rp)
    assert np.all(np.abs(rp - np.asarray(grav.rp)) < 0.5)
