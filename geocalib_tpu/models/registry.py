"""Model registry: name → Flax module class, plus conf-driven construction.

Re-design of /root/reference/siclib/models/__init__.py (dotted-path import
registry) and the BaseModel conf machinery
(/root/reference/siclib/models/base_model.py:25-34 conf-merge metaclass,
:97-102 weight autoload): Flax modules are frozen dataclasses, so their
field defaults ARE the `default_conf` — `build_model` merges a user conf
onto them with unknown-key validation and optionally autoloads pretrained
parameters named by the conf.
"""

import dataclasses
import importlib
from typing import Any, Dict, Optional, Tuple

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


def default_conf(cls: Any) -> Dict[str, Any]:
    """Field-name → default for a Flax module class.

    The analogue of the reference's MRO-merged ``default_conf``
    (base_model.py:25-34): Flax modules are dataclasses, so dataclass
    inheritance already merges defaults down the hierarchy.
    """
    out: Dict[str, Any] = {}
    for f in dataclasses.fields(cls):
        if f.name in ("parent", "name"):  # flax-internal fields
            continue
        if f.default is not dataclasses.MISSING:
            out[f.name] = f.default
        elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            out[f.name] = f.default_factory()  # type: ignore[misc]
    return out


def build_model(
    name: str, conf: Optional[Dict[str, Any]] = None
) -> Tuple[Any, Optional[Any]]:
    """Construct a registered model from a conf dict; autoload weights.

    conf keys are validated against the module's dataclass fields (the
    reference raises on unknown keys through OmegaConf struct mode). The
    reserved key ``weights`` names a pretrained-params source — a release
    name ("pinhole"/"distorted"), a reference ``.tar``, or a ``.msgpack``
    path — mirroring base_model.py:97-102's autoload. Returns
    ``(module, params-or-None)``.
    """
    conf = dict(conf or {})
    weights = conf.pop("weights", None)
    cls = get_model(name)
    known = default_conf(cls)
    required = {
        f.name
        for f in dataclasses.fields(cls)
        if f.name not in ("parent", "name")
        and f.default is dataclasses.MISSING
        and f.default_factory is dataclasses.MISSING  # type: ignore[misc]
    }
    unknown = set(conf) - set(known) - required
    if unknown:
        raise ValueError(
            f"unknown conf keys {sorted(unknown)} for model {name!r}; "
            f"known: {sorted(set(known) | required)}"
        )
    module = cls(**{**known, **conf})

    params = None
    if weights is not None:
        # load_params deserializes against a GeoCalibNet template; autoloading
        # weights for any other registered model would mis-load or fail with a
        # confusing shape error deep in flax.serialization
        if name != "networks.geocalib":
            raise ValueError(
                f"weight autoload is only supported for 'networks.geocalib' "
                f"(got {name!r}); construct the model and load its params "
                f"explicitly instead"
            )
        from pathlib import Path

        from geocalib_tpu.extractor import load_params
        from geocalib_tpu.hub import cached_params_path

        variant = conf.get("variant", "b")
        path = Path(str(weights))
        if path.suffix != ".msgpack":
            path = cached_params_path(str(weights))
        params = load_params(path, variant=variant)
    return module, params
