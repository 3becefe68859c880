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
import os
import zlib
from pathlib import Path
from typing import Dict, Optional, Sequence


def _force_cpu_backend() -> None:
    """Pin this process to the local CPU backend.

    Dataset generation is host-side work (numpy scenes + one batched render
    per pano); running its eager jnp ops through the remote-TPU relay would
    pay ~24 ms of tunnel latency per op. The sandbox's sitecustomize
    force-registers the relay whenever PALLAS_AXON_POOL_IPS is set, so both
    the env var and the jax config must be overridden (same recipe as
    tests/conftest.py).
    """
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


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


def _stable_seed(*parts) -> int:
    """Deterministic per-pano seed (Python's hash() is salted per process,
    which would make splits irreproducible and differ across pool workers)."""
    return zlib.crc32("|".join(str(p) for p in parts).encode()) % 2**31


def _render_one_pano(task: Dict) -> list:
    """Render + write all crops for one pano; returns its CSV rows.

    Module-level so a multiprocessing spawn pool can pickle it; each worker
    pins itself to the CPU backend first (see _force_cpu_backend).
    """
    _force_cpu_backend()
    pano_src = task["pano"]
    split, conf, camera_model, seed = (
        task["split"],
        task["conf"],
        task["camera_model"],
        task["seed"],
    )
    img_dir = Path(task["img_dir"])
    if isinstance(pano_src, (str, Path)):
        pano = load_image(pano_src)
        name = Path(pano_src).stem
    else:  # (name, pano_seed) pair: generate the synthetic pano in-worker
        name, pano_seed = pano_src
        pano = synthetic_pano(
            seed=pano_seed, height=conf["pano_height"], width=conf["pano_width"]
        )

    n = conf["crops_per_pano"]
    h, w = conf["height"], conf["width"]
    rng = np.random.default_rng(_stable_seed(name, split, seed))

    roll = np.radians(rng.uniform(*conf["roll_range"], n)).astype(np.float32)
    pitch = np.radians(rng.uniform(*conf["pitch_range"], n)).astype(np.float32)
    vfov = np.radians(rng.uniform(*conf["vfov_range"], n)).astype(np.float32)
    yaw = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    if camera_model == "pinhole":
        k1 = np.zeros(n, np.float32)
    else:
        k1 = np.array([sample_k1(rng, float(v), h, w) for v in vfov], np.float32)

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

    rows = []
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
    return rows


def generate_split(
    out_dir: Path,
    split: str,
    pano_paths: Sequence,
    conf: Dict,
    camera_model: str = "pinhole",
    seed: int = 0,
    workers: int = 0,
) -> None:
    """Render every pano of a split (optionally with a process pool)."""
    img_dir = out_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    tasks = [
        dict(
            pano=p,
            split=split,
            conf=conf,
            camera_model=camera_model,
            seed=seed,
            img_dir=str(img_dir),
        )
        for p in pano_paths
    ]
    rows: list = []
    if workers > 1 and len(tasks) > 1:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")  # fork would inherit a live jax runtime
        with ctx.Pool(workers) as pool:
            done = 0
            for r in pool.imap_unordered(_render_one_pano, tasks, chunksize=2):
                rows.extend(r)
                done += 1
                if done % 50 == 0:
                    print(f"  [{split}] {done}/{len(tasks)} panos", flush=True)
    else:
        for t in tasks:
            rows.extend(_render_one_pano(t))
    rows.sort(key=lambda r: r["fname"])  # pool order is nondeterministic

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
    workers: int = 0,
    **overrides,
) -> Path:
    """Generate a full dataset; returns the output directory."""
    conf = {**DEFAULTS, **overrides}
    # default pano resolution scales with crop size (tiny test datasets get
    # cheap panos; full 320² datasets get 768×1536 for real texture detail)
    conf.setdefault("pano_height", max(256, min(768, 2 * int(conf["height"]))))
    conf.setdefault("pano_width", 2 * conf["pano_height"])
    out = Path(out_dir)

    if pano_dir is not None:
        panos = sorted(
            p for p in Path(pano_dir).iterdir() if p.suffix.lower() in (".jpg", ".png", ".jpeg")
        )
    else:
        # (name, pano_seed) pairs: the pano itself is generated inside the
        # worker so the pool parallelizes scene synthesis too
        panos = [(f"synth{i:04d}", seed * 10_007 + i) for i in range(n_panos)]

    # allocate panos to splits: at least one each, never past the end
    counts = [max(1, int(round(len(panos) * frac))) for _, frac in splits]
    while sum(counts) > len(panos):
        counts[int(np.argmax(counts))] -= 1
    start = 0
    for (split, _), count in zip(splits, counts):
        assert count >= 1, f"not enough panos for split {split!r} ({len(panos)} total)"
        generate_split(
            out, split, panos[start : start + count], conf, camera_model, seed,
            workers=workers,
        )
        start += count
    return out


def main():
    _force_cpu_backend()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--pano_dir", default=None)
    ap.add_argument("--n_panos", type=int, default=16)
    ap.add_argument("--camera_model", default="pinhole")
    ap.add_argument("--height", type=int, default=DEFAULTS["height"])
    ap.add_argument("--width", type=int, default=DEFAULTS["width"])
    ap.add_argument("--crops_per_pano", type=int, default=DEFAULTS["crops_per_pano"])
    ap.add_argument("--pano_size", type=int, default=None,
                    help="equirect pano height (width = 2x); default adapts to crop size")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=0,
                    help="process-pool size for per-pano rendering")
    args = ap.parse_args()
    extra = {}
    if args.pano_size:
        extra = dict(pano_height=args.pano_size, pano_width=2 * args.pano_size)
    out = generate_dataset(
        args.out_dir,
        pano_dir=args.pano_dir,
        n_panos=args.n_panos,
        camera_model=args.camera_model,
        height=args.height,
        width=args.width,
        crops_per_pano=args.crops_per_pano,
        seed=args.seed,
        workers=args.workers,
        **extra,
    )
    print(f"dataset written to {out}")


if __name__ == "__main__":
    main()
