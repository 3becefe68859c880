"""Model registry: name → Flax module class.

Re-design of /root/reference/siclib/models/__init__.py (dotted-path import
registry): a plain dict registry with lazy imports, plus `get_model` parity.
"""

import importlib
from typing import Any, Dict

# name → "module:attribute"
_REGISTRY: Dict[str, str] = {
    "networks.geocalib": "geocalib_tpu.models.geocalib_net:GeoCalibNet",
    "networks.deepcalib": "geocalib_tpu.models.deepcalib:DeepCalib",
    "encoders.mscan": "geocalib_tpu.models.mscan:MSCAN",
    "encoders.low_level_encoder": "geocalib_tpu.models.geocalib_net:LowLevelEncoder",
    "encoders.vgg": "geocalib_tpu.models.encoders:VGG",
    "encoders.resnet": "geocalib_tpu.models.encoders:ResNet",
    "decoders.up_decoder": "geocalib_tpu.models.geocalib_net:UpDecoder",
    "decoders.latitude_decoder": "geocalib_tpu.models.geocalib_net:LatitudeDecoder",
    "decoders.light_hamburger": "geocalib_tpu.models.hamburger:LightHamHead",
    "decoders.fpn": "geocalib_tpu.models.fpn:FPN",
    "cache_loader": "geocalib_tpu.models.cache_loader:CacheLoader",
    # external-dependency comparison baselines (import-gated)
    "optimization.vp_from_prior": "geocalib_tpu.models.baselines:VPEstimator",
    "networks.dust3r": "geocalib_tpu.models.baselines:Dust3R",
}


def register_model(name: str, target: str) -> None:
    _REGISTRY[name] = target


def get_model(name: str) -> Any:
    """Resolve a registered (or dotted-path) model class."""
    if name in _REGISTRY:
        module_name, attr = _REGISTRY[name].split(":")
    elif ":" in name:
        module_name, attr = name.split(":")
    else:
        raise ValueError(f"unknown model {name!r}; registered: {sorted(_REGISTRY)}")
    return getattr(importlib.import_module(module_name), attr)
