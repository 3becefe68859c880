"""Image IO and preprocessing (host-side, numpy/PIL + jax.image).

Re-design of the reference preprocessor
(/root/reference/geocalib/utils.py:68-214, siclib/utils/image.py): resize the
short side to a target, center-crop to a multiple of 32, record the
scale/crop so cameras can be mapped back to original pixels. The reference
uses kornia/torchvision backends; here resizing is antialiased
jax.image.resize on host CPU — the TPU only ever sees the fixed-size crop.
"""

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import jax
import numpy as np

Array = np.ndarray


def load_image(path: Union[str, Path]) -> np.ndarray:
    """Load an image as float32 RGB (H, W, 3) in [0, 1] (PIL backend)."""
    from PIL import Image

    img = Image.open(str(path)).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def write_image(img: np.ndarray, path: Union[str, Path]) -> None:
    """Save float RGB [0,1] (H, W, 3) to disk."""
    from PIL import Image

    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(str(path))


def resize_image(
    img: np.ndarray, size: Tuple[int, int], antialias: bool = True
) -> np.ndarray:
    """Bilinear resize (H, W, C) → size, half-pixel centers, antialiased."""
    out = jax.image.resize(
        img, (size[0], size[1], img.shape[2]), method="bilinear", antialias=antialias
    )
    return np.asarray(out)


@dataclasses.dataclass
class PreprocessorConf:
    resize: Optional[int] = 320
    side: str = "short"
    edge_divisible_by: Optional[int] = 32
    antialias: bool = True
    square_crop: bool = False


class ImagePreprocessor:
    """Resize + crop images for calibration; records undo information.

    Output dict (numpy, unbatched):
        image: (h, w, 3) float32 RGB in [0, 1]
        scales: (2,) [sx, sy] new/old
        crop_pad: (2,) [dw, dh] (non-positive: center crop amounts)
        image_size: (2,) [w, h] after preprocessing
        original_image_size: (2,) [w, h]
    """

    def __init__(self, conf: Optional[PreprocessorConf] = None, **kw):
        self.conf = conf or PreprocessorConf(**kw)

    def target_size(self, h: int, w: int) -> Tuple[int, int]:
        c = self.conf
        if c.resize is None:
            return h, w
        aspect = w / h
        if (c.side == "short") ^ (aspect < 1.0):
            return c.resize, int(round(c.resize * aspect))
        return int(round(c.resize / aspect)), c.resize

    def __call__(self, img: np.ndarray) -> Dict[str, np.ndarray]:
        img = np.asarray(img, np.float32)
        h0, w0 = img.shape[:2]

        if self.conf.square_crop:
            m = min(h0, w0)
            oy, ox = (h0 - m) // 2, (w0 - m) // 2
            img = img[oy : oy + m, ox : ox + m]
            h0, w0 = img.shape[:2]

        th, tw = self.target_size(h0, w0)
        if (th, tw) != (h0, w0):
            img = resize_image(img, (th, tw), self.conf.antialias)
        scales = np.array([img.shape[1] / w0, img.shape[0] / h0], np.float32)

        crop_pad = np.zeros(2, np.float32)
        if self.conf.edge_divisible_by:
            d = self.conf.edge_divisible_by
            ch, cw = (img.shape[0] // d) * d, (img.shape[1] // d) * d
            dh, dw = ch - img.shape[0], cw - img.shape[1]
            top, left = (-dh) // 2, (-dw) // 2
            img = img[top : top + ch, left : left + cw]
            crop_pad = np.array([dw, dh], np.float32)

        return {
            "image": img,
            "scales": scales,
            "crop_pad": crop_pad,
            "image_size": np.array([img.shape[1], img.shape[0]], np.float32),
            "original_image_size": np.array([w0, h0], np.float32),
        }
