"""Shared-intrinsics and prior-conditioned calibration accuracy (r4 #8).

The extractor's shared_intrinsics and priors paths (extractor.py:118-174,
reference geocalib/lm_optimizer.py:361-383) exist in code and tests but had
never been shown on an accuracy artifact. This tool evaluates the trained
flagship model on a SAME-CAMERA synthetic test set (every crop rendered at
one fixed vfov, as a multi-frame capture from one device would be) under:

  single            plain per-image calibration (the baseline row)
  shared            shared_intrinsics=True over same-camera batches
  prior_focal       GT focal prior supplied, gravity solved
  prior_gravity     GT gravity prior supplied, intrinsics solved

and writes outputs/results/accuracy_conditioned.json + a markdown section
(appended to ACCURACY.md by --append).

Usage: python tools/eval_conditioned.py --weights weights/geocalib_synth_r05.msgpack
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

THRESH = (1.0, 5.0, 10.0)
VFOV_DEG = 55.0


def ensure_dataset(root: Path, batch: int, n_batches: int) -> Path:
    """Same-camera test set: every crop at vfov=VFOV_DEG (the same-camera
    premise shared_intrinsics needs)."""
    out = root / "data" / "openpano_sharedcam"
    if (out / "test.csv").exists():
        return out
    from geocalib_tpu.data.generate import generate_dataset

    n_panos = max(4, (batch * n_batches) // 32)
    generate_dataset(
        str(out),
        n_panos=n_panos,
        height=320,
        width=320,
        crops_per_pano=max(8, (batch * n_batches) // n_panos + 1),
        vfov_range=(VFOV_DEG, VFOV_DEG),
        splits=(("test", 1.0),),
        workers=4,
    )
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default="weights/geocalib_synth_r04.msgpack")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_batches", type=int, default=8)
    ap.add_argument("--out_json", default="outputs/results/accuracy_conditioned.json")
    ap.add_argument("--append", default=None, help="markdown file to append the section to")
    args = ap.parse_args()

    root = Path(__file__).resolve().parent.parent
    ds_dir = ensure_dataset(root, args.batch, args.n_batches)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(root / ".jax_cache"))

    from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset, batch_gt
    from geocalib_tpu.extractor import GeoCalib
    from geocalib_tpu.geometry.perspective_fields import (  # noqa: F401 (import check)
        get_perspective_field,
    )
    from geocalib_tpu.eval.metrics import camera_metrics, gravity_metrics
    from geocalib_tpu.utils.tools import compute_auc

    ds = SimpleDataset(
        DatasetConf(
            dataset_dir=str(ds_dir), csv_name="test.csv", batch_size=args.batch,
            augmentation="identity", shuffle=False,
        )
    )
    calib = GeoCalib(weights=str(root / args.weights))

    conditions = ("single", "shared", "prior_focal", "prior_gravity")
    errors = {c: {"roll_error": [], "pitch_error": [], "vfov_error": []} for c in conditions}

    f_gt_px = 320.0 / 2.0 / np.tan(np.radians(VFOV_DEG) / 2.0)
    n_done = 0
    for bi, batch in enumerate(ds.epoch(epoch=0)):
        if bi >= args.n_batches:
            break
        img = np.asarray(batch["image"], np.float32)
        cam_gt, grav_gt = batch_gt({k: jnp.asarray(v) for k, v in batch.items()})

        runs = {
            "single": dict(),
            "shared": dict(shared_intrinsics=True),
            "prior_focal": dict(priors={"focal": f_gt_px}),
            "prior_gravity": dict(priors={"gravity": grav_gt.vec3d}),
        }
        for cond, kw in runs.items():
            res = calib.calibrate(img, batched=True, **kw)
            cm = camera_metrics(res["camera"], cam_gt)
            gm = gravity_metrics(res["gravity"], grav_gt)
            errors[cond]["vfov_error"].append(np.asarray(cm["vfov_error"]))
            errors[cond]["roll_error"].append(np.asarray(gm["roll_error"]))
            errors[cond]["pitch_error"].append(np.asarray(gm["pitch_error"]))
        n_done += img.shape[0]
        print(f"batch {bi + 1}/{args.n_batches} done ({n_done} images)", flush=True)

    summary = {"dataset": str(ds_dir.name), "n_images": n_done,
               "vfov_deg": VFOV_DEG, "batch": args.batch}
    for cond in conditions:
        row = {}
        for m, vals in errors[cond].items():
            e = np.concatenate(vals)
            row[f"median_{m}"] = float(np.median(e))
            for t, a in zip(THRESH, compute_auc(e, THRESH, min_error=1.0)):
                row[f"auc_{m}@{int(t)}"] = a
        summary[cond] = row

    out_json = root / args.out_json
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps(summary, indent=1))

    lines = [
        "",
        "## Shared intrinsics & prior-conditioned calibration",
        "",
        f"Same-camera synthetic test set ({n_done} images, every crop at "
        f"vfov={VFOV_DEG:.0f}°), batches of {args.batch} frames per camera — the "
        "multi-frame capture setting shared_intrinsics exists for "
        "(reference `geocalib/lm_optimizer.py:361-383`). AUC@1°/5°/10° (higher "
        "is better):",
        "",
        "| condition | roll | pitch | vfov |",
        "|---|---|---|---|",
    ]
    label = {
        "single": "per-image (baseline)",
        "shared": "shared intrinsics (batch-coupled focal)",
        "prior_focal": "GT focal prior",
        "prior_gravity": "GT gravity prior",
    }
    for cond in conditions:
        r = summary[cond]
        cells = [
            " / ".join(f"{100 * r[f'auc_{m}@{int(t)}']:.1f}" for t in THRESH)
            for m in ("roll_error", "pitch_error", "vfov_error")
        ]
        lines.append(f"| {label[cond]} | " + " | ".join(cells) + " |")
    md = "\n".join(lines) + "\n"
    print(md)
    if args.append:
        with open(root / args.append, "a") as f:
            f.write(md)


if __name__ == "__main__":
    main()
