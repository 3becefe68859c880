"""Interactive-demo overlays render headlessly (no cv2 required)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity


@pytest.fixture()
def scene():
    cam = Camera.from_dict(
        {"height": 96.0, "width": 128.0, "vfov": 1.0, "k1": -0.05},
        model="simple_radial",
    )
    grav = Gravity.from_rp(jnp.asarray(0.1), jnp.asarray(-0.2))
    rng = np.random.default_rng(0)
    frame = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    from geocalib_tpu.geometry.perspective_fields import get_perspective_field

    cam_b = jax.tree.map(lambda x: jnp.asarray(x)[None], cam)
    grav_b = jax.tree.map(lambda x: jnp.asarray(x)[None], grav)
    up, lat = get_perspective_field(cam_b, grav_b, 96, 128)
    result = {
        "camera": cam,
        "gravity": grav,
        "up_field": np.asarray(up[0]),
        "latitude_field": np.asarray(lat[0]),
        "latitude_confidence": np.ones((96, 128), np.float32),
    }
    return frame, result


def test_render_all_overlays(scene):
    from geocalib_tpu.demo.overlays import render_overlays

    frame, result = scene
    toggles = {k: True for k in
               ("horizon", "up", "latitude", "confidence", "undistort", "grid", "box")}
    out = render_overlays(frame, result, toggles)
    assert out.shape == frame.shape
    assert out.min() >= 0 and out.max() <= 1
    assert np.abs(out - frame).max() > 0.05  # overlays actually drew something


def test_interactive_toggles(scene):
    from geocalib_tpu.demo.demo import InteractiveDemo

    frame, result = scene

    class Stub:
        def calibrate(self, rgb, camera_model="pinhole"):
            return result

    demo = InteractiveDemo(Stub())
    assert not demo.handle_key("l")
    assert demo.toggles["latitude"]
    assert not demo.handle_key("2")
    assert demo.camera_model == "simple_radial"
    assert demo.handle_key("q")
    out, res = demo.process_frame(frame)
    assert out.shape == frame.shape
    text = demo.format_results(res)
    assert "Roll" in text and "K1" in text
