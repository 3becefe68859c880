"""Model zoo: registry, alt encoders/decoders, DeepCalib, bin encodings."""

import chex
import jax
import jax.numpy as jnp
import numpy as np

from geocalib_tpu.models.deepcalib import BOUNDS, DeepCalib, bin_centers, bins_to_val
from geocalib_tpu.models.encoders import VGG, ResNet
from geocalib_tpu.models.fpn import FPN
from geocalib_tpu.models.perspective_encoding import (
    decode_bin_latitude,
    decode_up_bin,
    encode_bin_latitude,
    encode_up_bin,
)
from geocalib_tpu.models.registry import build_model, default_conf, get_model


def test_registry_resolves():
    assert get_model("networks.geocalib").__name__ == "GeoCalibNet"
    assert get_model("decoders.fpn").__name__ == "FPN"
    assert get_model("encoders.resnet").__name__ == "ResNet"


def test_default_conf_merges_dataclass_fields():
    conf = default_conf(get_model("networks.geocalib"))
    assert conf["variant"] == "b"
    assert conf["drop_path_rate"] == 0.0
    assert "parent" not in conf and "name" not in conf


def test_build_model_conf_merge_and_validation():
    import pytest

    net, params = build_model("networks.geocalib", {"variant": "tiny"})
    assert net.variant == "tiny"
    assert net.drop_path_rate == 0.0  # default survives the merge
    assert params is None  # no weights requested
    with pytest.raises(ValueError, match="unknown conf keys"):
        build_model("networks.geocalib", {"not_a_field": 1})


def test_build_model_autoloads_weights(tmp_path):
    from geocalib_tpu.extractor import save_params
    from geocalib_tpu.models.geocalib_net import GeoCalibNet

    net = GeoCalibNet(variant="b")
    variables = jax.eval_shape(
        lambda: net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 320, 320, 3)))
    )
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    path = tmp_path / "params.msgpack"
    save_params(variables, path)

    _, loaded = build_model("networks.geocalib", {"weights": str(path)})
    assert loaded is not None
    chex.assert_trees_all_equal_shapes(loaded, variables)


def test_alt_encoders_pyramid():
    img = jnp.zeros((1, 64, 64, 3))
    for enc in (VGG(dims=(8, 12, 16, 24), convs_per_stage=1),
                ResNet(dims=(8, 12, 16, 24), blocks_per_stage=1)):
        params = enc.init({"params": jax.random.PRNGKey(0)}, img)
        outs = enc.apply(params, img)
        assert len(outs) == 4
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_fpn_decoder():
    hl = [jnp.zeros((1, 16, 16, c)) for c in (8, 12, 16, 24)]
    ll = jnp.zeros((1, 64, 64, 16))
    fpn = FPN(out_channels=16)
    params = fpn.init({"params": jax.random.PRNGKey(0)}, hl, ll)
    feats, conf = fpn.apply(params, hl, ll)
    assert feats.shape == (1, 64, 64, 16)
    assert conf.shape == (1, 64, 64)


def test_deepcalib_tiny_forward():
    net = DeepCalib(num_bins=32, block_config=(2, 2), growth_rate=8)
    img = jnp.zeros((2, 64, 64, 3))
    params = net.init({"params": jax.random.PRNGKey(0)}, img)
    out = net.apply(params, img)
    for head in ("roll", "rho", "vfov", "k1_hat"):
        assert out[f"{head}_logits"].shape == (2, 32)
        lo, hi = BOUNDS[head]
        assert jnp.all(out[head] >= lo) and jnp.all(out[head] <= hi + (hi - lo))
    gt = {h: jnp.zeros((2,)) for h in ("roll", "rho", "vfov", "k1_hat")}
    gt["vfov"] = jnp.full((2,), 1.0)
    loss = DeepCalib.loss(out, gt, num_bins=32)
    assert loss.shape == (2,) and np.all(np.isfinite(loss))


def test_bins_to_val_softargmax():
    centers = bin_centers(0.0, 1.0, 11)
    logits = jnp.log(jax.nn.one_hot(jnp.array([5]), 11) + 1e-9)
    np.testing.assert_allclose(bins_to_val(centers, logits), centers[5])
    np.testing.assert_allclose(
        bins_to_val(centers, logits, softargmax=True), centers[5], atol=1e-3
    )


def test_up_bin_roundtrip():
    rng = np.random.default_rng(0)
    angles = rng.uniform(-np.pi, np.pi, (4, 8, 8))
    field = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    bins = encode_up_bin(field, 73)
    decoded = decode_up_bin(bins, 73)
    cos = jnp.sum(decoded * field, -1)
    assert float(cos.min()) > 0.99  # within one bin (~5 deg)


def test_latitude_bin_roundtrip():
    lat = jnp.asarray(np.random.default_rng(1).uniform(-1.4, 1.4, (4, 8, 8)), jnp.float32)
    bins = encode_bin_latitude(lat, 180)
    decoded = decode_bin_latitude(bins, 180)
    np.testing.assert_allclose(decoded, lat, atol=np.radians(1.0))
