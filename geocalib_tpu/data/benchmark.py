"""Variable-size benchmark dataset: preprocess + shape-bucketed batches.

Re-design of the reference eval data path (lamar2k/megadepth2k/... zips:
an ``images/`` dir + ``images.csv`` of GT rows, evaluated at batch 1 with
per-image preprocessing — /root/reference/siclib/eval/lamar2k.py:24-41,
siclib/datasets/simple_dataset.py:25-59,139-169). Real benchmark images
have many different sizes; the reference runs them one by one through a
torch model that tolerates dynamic shapes. XLA does not — every new shape
is a recompile — so this loader:

1. preprocesses every image exactly like the reference (resize short side
   to 320, center-crop to a multiple of 32) and records scale/crop undo
   data per image,
2. buckets rows by their *processed* (h, w) — for a 320/32 protocol that
   is a handful of aspect-ratio buckets, not thousands of raw sizes,
3. yields static-shape batches per bucket, padding the tail batch by
   repeating rows, with a ``valid`` mask so padded lanes are dropped from
   the metrics.

GT cameras are kept in ORIGINAL pixel space (packed camera rows); the eval
pipeline maps predictions back with ``undo_scale_crop`` and computes all
metrics in original pixels, matching simple_pipeline.py:281-282.

CSV schema (reference simple_dataset.load_csv:25-59): fname, height,
width, vfov (rad), roll, pitch (rad), optional px, py, k1, k2.
"""

import csv
import dataclasses
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from geocalib_tpu.utils.conversions import fov2focal
from geocalib_tpu.utils.image import ImagePreprocessor, PreprocessorConf, load_image

Array = np.ndarray


@dataclasses.dataclass
class BenchmarkDataConf:
    dataset_dir: str = ""
    csv_name: str = "images.csv"
    image_dir: str = "images"
    batch_size: int = 8
    resize: Optional[int] = 320
    edge_divisible_by: int = 32


def _row_float(row: Dict[str, str], key: str, default: float) -> float:
    val = row.get(key, "")
    return float(val) if val not in ("", None) else default


def parse_gt_row(row: Dict[str, str]) -> Tuple[Array, Array]:
    """CSV row → packed original-space camera data (8,) + (roll, pitch) (2,).

    Camera packing [w, h, fx, fy, cx, cy, k1, k2] matches Camera.from_data;
    f = fov2focal(vfov, h), principal point defaults to the image center
    (reference load_csv, simple_dataset.py:40-56).
    """
    h = float(row["height"])
    w = float(row["width"])
    f = float(fov2focal(np.float64(row["vfov"]), h))
    px = _row_float(row, "px", w / 2.0)
    py = _row_float(row, "py", h / 2.0)
    k1 = _row_float(row, "k1", 0.0)
    k2 = _row_float(row, "k2", 0.0)
    cam = np.array([w, h, f, f, px, py, k1, k2], np.float32)
    rp = np.array([float(row["roll"]), float(row["pitch"])], np.float32)
    return cam, rp


class BenchmarkDataset:
    """Shape-bucketed iterator over a real (variable-size) benchmark dir."""

    def __init__(self, conf: Optional[BenchmarkDataConf] = None, **kw):
        self.conf = conf or BenchmarkDataConf(**kw)
        root = Path(self.conf.dataset_dir)
        self.image_dir = root / self.conf.image_dir
        with open(root / self.conf.csv_name) as fh:
            self.rows = list(csv.DictReader(fh))
        assert self.rows, f"empty benchmark {root / self.conf.csv_name}"
        self.preprocessor = ImagePreprocessor(
            PreprocessorConf(
                resize=self.conf.resize,
                edge_divisible_by=self.conf.edge_divisible_by,
            )
        )

    def __len__(self) -> int:
        return len(self.rows)

    def _processed_shape(self, h: int, w: int) -> Tuple[int, int]:
        """Post-preprocess (h, w) for bucketing, computed without decoding."""
        th, tw = self.preprocessor.target_size(h, w)
        d = self.conf.edge_divisible_by
        if d:
            th, tw = (th // d) * d, (tw // d) * d
        return th, tw

    def _buckets(self) -> Dict[Tuple[int, int], List[int]]:
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for i, row in enumerate(self.rows):
            try:
                h, w = int(float(row["height"])), int(float(row["width"]))
            except (KeyError, ValueError):
                # no/invalid size columns: read the header only (cheap)
                from PIL import Image

                with Image.open(self.image_dir / row["fname"]) as im:
                    w, h = im.size
            buckets.setdefault(self._processed_shape(h, w), []).append(i)
        return buckets

    def _load(self, idx: int) -> Dict[str, Array]:
        row = self.rows[idx]
        img = load_image(self.image_dir / row["fname"])
        data = self.preprocessor(img)
        cam, rp = parse_gt_row(row)
        return {
            "image": data["image"],
            "scales": data["scales"],
            "crop_pad": data["crop_pad"],
            "gt_cam": cam,
            "gt_rp": rp,
            "name": row["fname"],
        }

    def batches(self) -> Iterator[Dict[str, Array]]:
        """Static-shape batches; the tail of each bucket is padded
        (repeating its last rows) with valid=False lanes."""
        B = self.conf.batch_size
        buckets = self._buckets()
        for shape in sorted(buckets):
            idxs = buckets[shape]
            for start in range(0, len(idxs), B):
                chunk = idxs[start : start + B]
                valid = np.zeros((B,), bool)
                valid[: len(chunk)] = True
                padded = chunk + [chunk[-1]] * (B - len(chunk))
                samples = [self._load(i) for i in padded]
                img = np.stack([s["image"] for s in samples])
                if img.shape[1:3] != shape:
                    raise ValueError(
                        f"decoded shape {img.shape[1:3]} != bucket {shape} — "
                        f"CSV height/width disagree with the image files"
                    )
                yield {
                    "image": img.astype(np.float32),
                    "scales": np.stack([s["scales"] for s in samples]),
                    "crop_pad": np.stack([s["crop_pad"] for s in samples]),
                    "gt_cam": np.stack([s["gt_cam"] for s in samples]),
                    "gt_rp": np.stack([s["gt_rp"] for s in samples]),
                    "valid": valid,
                    "names": [s["name"] for s in samples],
                }
