"""Offline dataset generation: panoramas → perspective crops + CSV splits.

Re-design of /root/reference/siclib/datasets/create_dataset_from_pano.py:
per pano, sample `crops_per_pano` yaws with random roll/pitch/vfov (and
optionally k1_hat for radial training data), render crops with the jnp pano
renderer, and write JPEGs + one CSV per split. The reference parallelizes
with a host process pool; here rendering is a single batched jnp call per
pano (all yaws at once), which is faster than its per-crop remap loop.

With no pano directory given, procedural synthetic panoramas
(data/pano.py) are used so the full pipeline runs without any downloads
(this sandbox has no network egress; point --pano_dir at OpenPano/Laval
panos to reproduce the reference datasets).

CLI: python -m geocalib_tpu.data.generate --out_dir data/openpano_synth
"""

import argparse
import csv
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from geocalib_tpu.data.pano import render_from_pano, synthetic_pano
from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.utils.image import load_image, write_image

DEFAULTS = dict(
    # sampling ranges, parity with siclib/datasets/configs/openpano.yaml
    roll_range=(-45.0, 45.0),  # degrees
    pitch_range=(-45.0, 45.0),
    vfov_range=(20.0, 105.0),
    height=640,
    width=640,
    crops_per_pano=16,
)


def max_radius(a: float, b: float) -> float:
    """Largest valid normalized radius for Brown distortion a r + b r³.

    Parity: create_dataset_from_pano.py:28-40 (monotonicity bound).
    """
    discrim = a * a - 4 * b
    if b > 0:
        return float("inf") if discrim < 0 else np.sqrt((-a - np.sqrt(discrim)) / (2 * b))
    if b < 0:
        return np.sqrt((-a + np.sqrt(discrim)) / (2 * b)) if discrim >= 0 else float("inf")
    return float("inf") if a >= 0 else np.sqrt(-1.0 / (3.0 * a))


def brown_max_radius(k1: float, k2: float = 0.0) -> float:
    """Max radius where the Brown model stays monotonic (reference :43-47)."""
    return max_radius(3 * k1, 5 * k2)


def sample_k1(rng: np.random.Generator, vfov: float, h: float, w: float) -> float:
    """Sample k1_hat ~ truncnorm-ish and correct for feasibility
    (create_dataset_from_pano.py:242-264)."""
    for _ in range(32):
        k1_hat = rng.normal(-0.3, 0.3)
        k1_hat = float(np.clip(k1_hat, -0.8, 0.2))
        f = h / 2.0 / np.tan(vfov / 2.0)
        k1 = k1_hat * (f / h) ** 2
        # image corner radius in normalized coords
        rmax_img = np.sqrt((w / 2) ** 2 + (h / 2) ** 2) / f
        if brown_max_radius(k1) > rmax_img:
            return k1
    return 0.0


def generate_split(
    out_dir: Path,
    split: str,
    pano_paths: Sequence,
    conf: Dict,
    camera_model: str = "pinhole",
    seed: int = 0,
) -> None:
    img_dir = out_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    n = conf["crops_per_pano"]
    h, w = conf["height"], conf["width"]

    for pano_path in pano_paths:
        if isinstance(pano_path, (str, Path)):
            pano = load_image(pano_path)
            name = Path(pano_path).stem
        else:  # (name, array) pair from the synthetic generator
            name, pano = pano_path
        rng = np.random.default_rng(abs(hash((name, split, seed))) % 2**31)

        roll = np.radians(rng.uniform(*conf["roll_range"], n)).astype(np.float32)
        pitch = np.radians(rng.uniform(*conf["pitch_range"], n)).astype(np.float32)
        vfov = np.radians(rng.uniform(*conf["vfov_range"], n)).astype(np.float32)
        yaw = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        if camera_model == "pinhole":
            k1 = np.zeros(n, np.float32)
        else:
            k1 = np.array(
                [sample_k1(rng, float(v), h, w) for v in vfov], np.float32
            )

        cam = Camera.from_dict(
            {
                "height": jnp.full((n,), float(h)),
                "width": jnp.full((n,), float(w)),
                "vfov": jnp.asarray(vfov),
                "k1": jnp.asarray(k1),
            },
            model=camera_model,
        )
        grav = Gravity.from_rp(jnp.asarray(roll), jnp.asarray(pitch))
        crops = np.asarray(render_from_pano(jnp.asarray(pano), cam, grav, jnp.asarray(yaw)))

        for i in range(n):
            fname = f"{name}_{split}_{i:02d}.jpg"
            write_image(crops[i], img_dir / fname)
            rows.append(
                {
                    "fname": fname,
                    "height": h,
                    "width": w,
                    "vfov": float(vfov[i]),
                    "roll": float(roll[i]),
                    "pitch": float(pitch[i]),
                    "k1": float(k1[i]),
                    "k2": 0.0,
                }
            )

    with open(out_dir / f"{split}.csv", "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def generate_dataset(
    out_dir: str,
    pano_dir: Optional[str] = None,
    n_panos: int = 16,
    camera_model: str = "pinhole",
    seed: int = 0,
    splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    **overrides,
) -> Path:
    """Generate a full dataset; returns the output directory."""
    conf = {**DEFAULTS, **overrides}
    out = Path(out_dir)

    if pano_dir is not None:
        panos = sorted(
            p for p in Path(pano_dir).iterdir() if p.suffix.lower() in (".jpg", ".png", ".jpeg")
        )
    else:
        panos = [
            (f"synth{i:04d}", synthetic_pano(seed=seed * 10_007 + i))
            for i in range(n_panos)
        ]

    # allocate panos to splits: at least one each, never past the end
    counts = [max(1, int(round(len(panos) * frac))) for _, frac in splits]
    while sum(counts) > len(panos):
        counts[int(np.argmax(counts))] -= 1
    start = 0
    for (split, _), count in zip(splits, counts):
        assert count >= 1, f"not enough panos for split {split!r} ({len(panos)} total)"
        generate_split(
            out, split, panos[start : start + count], conf, camera_model, seed
        )
        start += count
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--pano_dir", default=None)
    ap.add_argument("--n_panos", type=int, default=16)
    ap.add_argument("--camera_model", default="pinhole")
    ap.add_argument("--height", type=int, default=DEFAULTS["height"])
    ap.add_argument("--width", type=int, default=DEFAULTS["width"])
    ap.add_argument("--crops_per_pano", type=int, default=DEFAULTS["crops_per_pano"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = generate_dataset(
        args.out_dir,
        pano_dir=args.pano_dir,
        n_panos=args.n_panos,
        camera_model=args.camera_model,
        height=args.height,
        width=args.width,
        crops_per_pano=args.crops_per_pano,
        seed=args.seed,
    )
    print(f"dataset written to {out}")


if __name__ == "__main__":
    main()
