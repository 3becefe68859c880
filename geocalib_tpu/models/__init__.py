"""Neural networks: MSCAN backbone, Hamburger decoders, GeoCalib assembly."""

from geocalib_tpu.models.geocalib_net import (
    GeoCalibNet,
    LatitudeDecoder,
    LowLevelEncoder,
    UpDecoder,
)
from geocalib_tpu.models.hamburger import NMF2D, Hamburger, LightHamHead
from geocalib_tpu.models.mscan import MSCAN, MSCAN_VARIANTS

__all__ = [
    "GeoCalibNet",
    "LatitudeDecoder",
    "LowLevelEncoder",
    "UpDecoder",
    "NMF2D",
    "Hamburger",
    "LightHamHead",
    "MSCAN",
    "MSCAN_VARIANTS",
]
