"""Weight-conversion parity: reference torch model vs converted Flax model.

The released GeoCalib checkpoints cannot be downloaded here (no egress), so
the converter is verified the strong way: instantiate the *reference*
architecture (read-only at /root/reference) with random weights, convert its
state_dict with geocalib_tpu.models.convert_torch, and require the two
frameworks to produce the same perspective fields on the same input.
This proves the mapping (names, layouts, BN stats, eps/GELU conventions) is
exact, which is everything conversion of the released .tar files needs.
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


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, REF)
    # stub the visualization-only deps the reference imports at module level
    for mod in ["kornia", "torchvision", "cv2", "matplotlib", "matplotlib.pyplot",
                "matplotlib.cm"]:
        # stub only what is truly absent: an empty placeholder for an
        # installed module (e.g. cv2) would poison later tests in the run
        try:
            importlib.import_module(mod)
        except ImportError:
            sys.modules.setdefault(mod, types.ModuleType(mod))
    from geocalib.geocalib import GeoCalib as TorchGeoCalib

    torch.manual_seed(0)
    model = TorchGeoCalib().eval()
    # make BN running stats non-trivial so the conversion of stats is tested
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.3)
    yield model
    sys.path.remove(REF)


def test_converted_fields_match_reference(reference_model):
    from geocalib_tpu.models import GeoCalibNet
    from geocalib_tpu.models.convert_torch import convert_state_dict

    B, H, W = 2, 64, 64
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)

    # Identical NMF bases on both sides: our NMF2D draws uniform bases from
    # PRNGKey(0) in deterministic eval; feed the same bases to the reference
    # (which draws fresh torch.rand bases per forward — modules.py:131-133).
    D, R = 512, 64
    bases = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (B, D, R)))

    def fixed_bases(self, b, s, d, r, device="cpu"):
        t = torch.from_numpy(bases)
        return torch.nn.functional.normalize(t, dim=1)

    from geocalib.modules import NMF2D as TorchNMF2D

    old = TorchNMF2D._build_bases
    TorchNMF2D._build_bases = fixed_bases
    try:
        with torch.no_grad():
            timg = torch.from_numpy(img).permute(0, 3, 1, 2)
            hl = reference_model.backbone({"image": timg})["features"]
            ll = reference_model.ll_enc({"image": timg})["features"]
            ref = reference_model.perspective_decoder(
                {"features": {"hl": hl, "ll": ll}}
            )
    finally:
        TorchNMF2D._build_bases = old

    variables = convert_state_dict(
        {k: v.numpy() for k, v in reference_model.state_dict().items()}
    )
    net = GeoCalibNet(variant="b")
    out = jax.jit(lambda p, x: net.apply(p, x))(variables, jnp.asarray(img))

    ref_up = ref["up_field"].permute(0, 2, 3, 1).numpy()
    ref_lat = ref["latitude_field"].permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out["up_field"]), ref_up, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["latitude_field"]), ref_lat, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["up_confidence"]), ref["up_confidence"].numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["latitude_confidence"]),
        ref["latitude_confidence"].numpy(),
        atol=2e-3,
    )


def test_convert_rejects_unknown_keys(reference_model):
    from geocalib_tpu.models.convert_torch import convert_state_dict

    sd = {k: v.numpy() for k, v in reference_model.state_dict().items()}
    sd["backbone.bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_state_dict(sd)


def test_convert_strips_siclib_prefix(reference_model):
    """siclib training checkpoints nest one extra segment (flexible_load)."""
    from geocalib_tpu.models.convert_torch import convert_state_dict

    def add_segment(k):
        parts = k.split(".")
        return ".".join([parts[0], "encoder"] + parts[1:])

    sd = {add_segment(k): v.numpy() for k, v in reference_model.state_dict().items()}
    variables = convert_state_dict(sd)
    assert "MSCAN_0" in variables["params"]
