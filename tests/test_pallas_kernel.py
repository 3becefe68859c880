"""Fused Pallas LM kernel vs the planar XLA path (interpreter mode on CPU).

The kernel's per-tile math is the planar implementation itself, so these
tests pin the *plumbing*: tiling/accumulation over the pixel grid, the
in-kernel camera/gravity reconstruction, the custom_vjp backward, and the
end-to-end solver dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.perspective_fields import get_perspective_field
from geocalib_tpu.optim.lm import (
    LMConfig,
    Observations,
    _cost_only,
    _costs_and_weights,
    _residuals,
    build_system,
    flatten_observations,
    run_lm,
)
from geocalib_tpu.ops.lm_kernel import lm_system_pallas, pallas_tile


def _setup(model: str, B: int = 3, h: int = 16, w: int = 16, conf: bool = True):
    rng = np.random.default_rng(0)
    k1 = rng.uniform(-0.2, 0.0, (B,)) if model != "pinhole" else np.zeros(B)
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(h)),
            "width": jnp.full((B,), float(w)),
            "vfov": jnp.asarray(rng.uniform(0.6, 1.4, (B,)), jnp.float32),
            "k1": jnp.asarray(k1, jnp.float32),
        },
        model=model,
    )
    grav = Gravity.from_rp(
        jnp.asarray(rng.uniform(-0.4, 0.4, (B,)), jnp.float32),
        jnp.asarray(rng.uniform(-0.4, 0.4, (B,)), jnp.float32),
    )
    up, lat = get_perspective_field(cam, grav, h, w)
    data = {
        "up_field": up + 0.05 * rng.normal(size=up.shape).astype(np.float32),
        "latitude_field": lat + 0.05 * rng.normal(size=lat.shape).astype(np.float32),
    }
    if conf:
        data["up_confidence"] = jnp.asarray(rng.uniform(0.2, 1.0, (B, h, w)), jnp.float32)
        data["latitude_confidence"] = jnp.asarray(
            rng.uniform(0.2, 1.0, (B, h, w)), jnp.float32
        )
    # a *different* camera/gravity as the current estimate
    cam2 = Camera.from_dict(
        {
            "height": jnp.full((B,), float(h)),
            "width": jnp.full((B,), float(w)),
            "vfov": jnp.full((B,), 1.0, jnp.float32),
            "k1": jnp.asarray(k1 * 0.5, jnp.float32),
        },
        model=model,
    )
    grav2 = Gravity.from_rp(jnp.zeros((B,)), jnp.zeros((B,)))
    return data, cam2, grav2, h, w


@pytest.mark.parametrize("model", ["pinhole", "simple_radial", "radial", "simple_divisional"])
@pytest.mark.parametrize("conf", [True, False])
def test_kernel_matches_planar_system(model, conf):
    data, cam, grav, h, w = _setup(model, conf=conf)
    cfg = LMConfig(camera_model=model)
    obs, _, _ = flatten_observations(data, cfg)
    obs_d = {k: v for k, v in obs._asdict().items() if v is not None}

    G_k, H_k, cost_k = lm_system_pallas(obs_d, cam, grav, h, w, cfg, True, True)

    r_up, r_lat = _residuals(cam, grav, obs, h, w)
    total, w_up, w_lat = _costs_and_weights(r_up, r_lat, obs, cfg)
    G_p, H_p = build_system(cam, grav, r_up, r_lat, w_up, w_lat, h, w, cfg)

    np.testing.assert_allclose(np.asarray(G_k), np.asarray(G_p), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(H_k), np.asarray(H_p), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cost_k), np.asarray(total), rtol=1e-5, atol=1e-6)


def test_kernel_cost_only_matches():
    data, cam, grav, h, w = _setup("simple_radial")
    cfg = LMConfig(camera_model="simple_radial")
    obs, _, _ = flatten_observations(data, cfg)
    obs_d = {k: v for k, v in obs._asdict().items() if v is not None}
    _, _, cost_k = lm_system_pallas(obs_d, cam, grav, h, w, cfg, False, True)
    cost_p = _cost_only(cam, grav, obs, h, w, cfg)
    np.testing.assert_allclose(np.asarray(cost_k), np.asarray(cost_p), rtol=1e-5, atol=1e-6)


def test_kernel_respects_param_mask():
    data, cam, grav, h, w = _setup("radial")
    cfg = LMConfig(camera_model="radial", estimate_focal=False)
    obs, _, _ = flatten_observations(data, cfg)
    obs_d = {k: v for k, v in obs._asdict().items() if v is not None}
    G, H, _ = lm_system_pallas(obs_d, cam, grav, h, w, cfg, True, True)
    np.testing.assert_allclose(np.asarray(G)[:, 2], 0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(H)[:, 2, :], 0.0, atol=0.0)


def test_kernel_custom_vjp_matches_planar_grad():
    data, cam, grav, h, w = _setup("pinhole", B=2)
    cfg = LMConfig(camera_model="pinhole")
    obs, _, _ = flatten_observations(data, cfg)
    obs_d = {k: v for k, v in obs._asdict().items() if v is not None}

    def loss_kernel(d):
        G, H, cost = lm_system_pallas(d, cam, grav, h, w, cfg, True, True)
        return jnp.sum(G**2) + jnp.sum(H**2) + jnp.sum(cost)

    def loss_planar(d):
        o = Observations(**{k: d.get(k) for k in Observations._fields})
        r_up, r_lat = _residuals(cam, grav, o, h, w)
        total, w_up, w_lat = _costs_and_weights(r_up, r_lat, o, cfg)
        G, H = build_system(cam, grav, r_up, r_lat, w_up, w_lat, h, w, cfg)
        return jnp.sum(G**2) + jnp.sum(H**2) + jnp.sum(total)

    g_k = jax.grad(loss_kernel)(obs_d)
    g_p = jax.grad(loss_planar)(obs_d)
    for k in obs_d:
        np.testing.assert_allclose(
            np.asarray(g_k[k]), np.asarray(g_p[k]), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("model", ["pinhole", "radial"])
def test_run_lm_pallas_matches_xla(model):
    data, _, _, h, w = _setup(model, conf=True)
    base = LMConfig(camera_model=model, num_steps=10)
    res_x = run_lm(dict(data), base)
    res_k = run_lm(
        dict(data),
        LMConfig(camera_model=model, num_steps=10, use_pallas=True, pallas_interpret=True),
    )
    np.testing.assert_allclose(
        np.asarray(res_k.gravity.rp), np.asarray(res_x.gravity.rp), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_k.camera.vfov), np.asarray(res_x.camera.vfov), rtol=1e-4, atol=1e-5
    )


def test_pallas_tile():
    assert pallas_tile(320 * 320) == 1024
    assert pallas_tile(16 * 16) == 256
    assert pallas_tile(7 * 13) is None
