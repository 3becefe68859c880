"""End-to-end LM solver parity: reference LMOptimizer vs run_lm.

The round-1 converter test proved *field* parity; this proves *solver*
parity: both solvers consume the SAME noisy synthetic fields and must agree
on roll/pitch/vfov (and, looser, the uncertainty outputs). Covers pinhole +
simple_radial and both gravity manifolds — the inference preset (30 steps,
huber 1e-2, early stop) on both sides.

Reference under test: /root/reference/geocalib/lm_optimizer.py:551-644
(optimize loop), :463-516 (estimate_uncertainty).
"""

import importlib
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def reference_path():
    sys.path.insert(0, REF)
    for mod in ["kornia", "torchvision", "cv2", "matplotlib", "matplotlib.pyplot",
                "matplotlib.cm"]:
        # stub only what is truly absent: an empty placeholder for an
        # installed module (e.g. cv2) would poison later tests in the run
        try:
            importlib.import_module(mod)
        except ImportError:
            sys.modules.setdefault(mod, types.ModuleType(mod))
    yield
    sys.path.remove(REF)


def _make_fields(camera_model: str, B: int = 3, H: int = 48, W: int = 64):
    """Noisy synthetic fields + confidences from random GT cameras (numpy)."""
    from geocalib_tpu.geometry.camera import Camera
    from geocalib_tpu.geometry.gravity import Gravity
    from geocalib_tpu.geometry.perspective_fields import get_perspective_field

    rng = np.random.default_rng(7)
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(H)),
            "width": jnp.full((B,), float(W)),
            "vfov": jnp.asarray(rng.uniform(0.7, 1.3, (B,)), jnp.float32),
            "k1": jnp.asarray(rng.uniform(-0.08, 0.08, (B,)), jnp.float32),
        },
        model=camera_model,
    )
    grav = Gravity.from_rp(
        jnp.asarray(rng.uniform(-0.4, 0.4, (B,)), jnp.float32),
        jnp.asarray(rng.uniform(-0.4, 0.4, (B,)), jnp.float32),
    )
    up, lat = get_perspective_field(cam, grav, H, W)
    up = np.asarray(up) + rng.normal(0, 0.01, (B, H, W, 2)).astype(np.float32)
    lat = np.asarray(lat) + rng.normal(0, 0.01, (B, H, W, 1)).astype(np.float32)
    conf_up = rng.uniform(0.5, 1.0, (B, H, W)).astype(np.float32)
    conf_lat = rng.uniform(0.5, 1.0, (B, H, W)).astype(np.float32)
    return up, lat, conf_up, conf_lat


def _run_reference(camera_model, spherical, up, lat, conf_up, conf_lat):
    from geocalib.lm_optimizer import LMOptimizer as TorchLM

    # eval mode: the reference computes uncertainties only when not training
    # (lm_optimizer.py:636)
    opt = TorchLM(
        {"camera_model": camera_model, "use_spherical_manifold": spherical}
    ).eval()
    data = {
        "up_field": torch.from_numpy(np.transpose(up, (0, 3, 1, 2))),
        "latitude_field": torch.from_numpy(np.transpose(lat, (0, 3, 1, 2))),
        "up_confidence": torch.from_numpy(conf_up)[:, None],
        "latitude_confidence": torch.from_numpy(conf_lat)[:, None],
    }
    with torch.no_grad():
        out = opt(data)
    return out


def _run_ours(camera_model, spherical, up, lat, conf_up, conf_lat):
    from geocalib_tpu.optim.lm import LMConfig, run_lm

    cfg = LMConfig(camera_model=camera_model, use_spherical_manifold=spherical)
    data = {
        "up_field": jnp.asarray(up),
        "latitude_field": jnp.asarray(lat),
        "up_confidence": jnp.asarray(conf_up),
        "latitude_confidence": jnp.asarray(conf_lat),
    }
    return jax.jit(lambda d: run_lm(d, cfg))(data)


@pytest.mark.parametrize(
    "camera_model,spherical",
    [("pinhole", True), ("pinhole", False), ("simple_radial", True)],
)
def test_solver_parity(camera_model, spherical):
    up, lat, conf_up, conf_lat = _make_fields(camera_model)
    ref = _run_reference(camera_model, spherical, up, lat, conf_up, conf_lat)
    ours = _run_ours(camera_model, spherical, up, lat, conf_up, conf_lat)

    ref_rp = ref["gravity"].rp.numpy()
    ref_vfov = ref["camera"].vfov.numpy()
    np.testing.assert_allclose(np.asarray(ours.gravity.rp), ref_rp, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours.camera.vfov), ref_vfov, atol=5e-4)
    if camera_model != "pinhole":
        np.testing.assert_allclose(
            np.asarray(ours.camera.k[..., 0]), ref["camera"].k1.numpy(), atol=1e-3
        )

    # uncertainties (looser: final-state covariances amplify tiny path diffs)
    for key in (
        "roll_uncertainty",
        "pitch_uncertainty",
        "gravity_uncertainty",
        "focal_uncertainty",
        "vfov_uncertainty",
    ):
        np.testing.assert_allclose(
            np.asarray(ours.info[key]),
            ref[key].numpy(),
            rtol=5e-2,
            atol=1e-5,
            err_msg=key,
        )


def test_solver_parity_shared_intrinsics():
    """Shared-intrinsics mode: one focal for the whole batch, λ updating."""
    from geocalib_tpu.optim.lm import LMConfig, run_lm
    from geocalib.lm_optimizer import LMOptimizer as TorchLM

    # same GT focal for all lanes so the shared solve is consistent
    from geocalib_tpu.geometry.camera import Camera
    from geocalib_tpu.geometry.gravity import Gravity
    from geocalib_tpu.geometry.perspective_fields import get_perspective_field

    B, H, W = 4, 48, 48
    rng = np.random.default_rng(3)
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(H)),
            "width": jnp.full((B,), float(W)),
            "vfov": jnp.full((B,), 1.05, jnp.float32),
        },
        model="pinhole",
    )
    grav = Gravity.from_rp(
        jnp.asarray(rng.uniform(-0.4, 0.4, (B,)), jnp.float32),
        jnp.asarray(rng.uniform(-0.4, 0.4, (B,)), jnp.float32),
    )
    up, lat = get_perspective_field(cam, grav, H, W)
    up = np.asarray(up) + rng.normal(0, 0.01, up.shape).astype(np.float32)
    lat = np.asarray(lat) + rng.normal(0, 0.01, lat.shape).astype(np.float32)

    opt = TorchLM({"camera_model": "pinhole", "shared_intrinsics": True}).eval()
    with torch.no_grad():
        ref = opt(
            {
                "up_field": torch.from_numpy(np.transpose(up, (0, 3, 1, 2))),
                "latitude_field": torch.from_numpy(np.transpose(lat, (0, 3, 1, 2))),
            }
        )

    cfg = LMConfig(camera_model="pinhole", shared_intrinsics=True)
    ours = jax.jit(lambda d: run_lm(d, cfg))(
        {"up_field": jnp.asarray(up), "latitude_field": jnp.asarray(lat)}
    )

    ref_vfov = ref["camera"].vfov.numpy()
    assert np.ptp(np.asarray(ours.camera.vfov)) < 1e-6, "focal not shared"
    np.testing.assert_allclose(np.asarray(ours.camera.vfov), ref_vfov, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ours.gravity.rp), ref["gravity"].rp.numpy(), atol=1e-3
    )
