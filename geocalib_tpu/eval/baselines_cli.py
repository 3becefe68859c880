"""Evaluate non-learned baselines on a generated benchmark split.

Produces the same summary dict (mean/median errors + AUC@1/5/10) as the
learned pipeline (eval/pipeline.py + utils/tools.py), so baseline rows and
GeoCalib-TPU rows in the README tables come from the same metric code —
the reference computes its UVP/DeepCalib rows through the identical
SimplePipeline for the same reason (siclib/eval/simple_pipeline.py).

Methods:
    uvp      — native line-based VP calibration (models/uvp.py)
    trivial  — roll = pitch = 0, f = 0.7 * max(h, w)
               (the solver's trivial init, lm_optimizer.py:20-58)

CLI:
    python -m geocalib_tpu.eval.baselines_cli openpano_synth --method uvp
"""

import argparse
import json
from pathlib import Path
from typing import Dict

import numpy as np

EVAL_PATH = Path("outputs/results")


def evaluate_baseline(
    method: str,
    dataset_dir: str,
    split: str = "test",
    camera_model: str = "pinhole",
    experiment_dir: str = None,
    max_images: int = None,
) -> Dict[str, float]:
    import jax.numpy as jnp

    from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset, batch_gt
    from geocalib_tpu.eval.metrics import camera_metrics, gravity_metrics
    from geocalib_tpu.geometry.camera import Camera
    from geocalib_tpu.geometry.gravity import Gravity
    from geocalib_tpu.utils.tools import summarize_results

    ds = SimpleDataset(
        DatasetConf(
            dataset_dir=dataset_dir,
            csv_name=f"{split}.csv",
            batch_size=8,
            shuffle=False,
            augmentation="identity",
            camera_model=camera_model,
        )
    )

    if method == "uvp":
        from geocalib_tpu.models.uvp import NativeUVP

        solver = NativeUVP()
        prior = np.array([0.0, 1.0, 0.0])

        def predict(images):
            h, w = images.shape[1:3]
            fs, gs = [], []
            for im in images:
                f, g = solver.estimate(im, prior)
                fs.append(f)
                gs.append(g)
            cam = Camera.from_dict(
                {
                    "height": jnp.full((len(fs),), float(h)),
                    "width": jnp.full((len(fs),), float(w)),
                    "f": jnp.asarray(fs, jnp.float32),
                }
            )
            grav = Gravity.from_vec3d(jnp.asarray(np.stack(gs), jnp.float32))
            return cam, grav

    elif method == "trivial":

        def predict(images):
            B = len(images)
            h, w = images.shape[1:3]
            cam = Camera.from_dict(
                {
                    "height": jnp.full((B,), float(h)),
                    "width": jnp.full((B,), float(w)),
                    "f": jnp.full((B,), 0.7 * max(h, w)),
                }
            )
            grav = Gravity.from_rp(jnp.zeros(B), jnp.zeros(B))
            return cam, grav

    else:
        raise ValueError(f"unknown baseline method {method!r}")

    results: Dict[str, list] = {}
    seen = 0
    for batch in ds.epoch(epoch=0):
        if max_images is not None and seen >= max_images:
            break
        images = np.asarray(batch["image"])
        seen += len(images)
        cam_pred, grav_pred = predict(images)
        cam_gt, grav_gt = batch_gt(batch, camera_model)
        out = camera_metrics(cam_pred, cam_gt)
        out |= gravity_metrics(grav_pred, grav_gt)
        for k, v in out.items():
            results.setdefault(k, []).append(np.asarray(v))

    results_np = {k: np.concatenate(v) for k, v in results.items()}
    summaries = summarize_results(results_np)
    summaries["n_images"] = seen
    summaries["method"] = method

    if experiment_dir is not None:
        exp = Path(experiment_dir)
        exp.mkdir(parents=True, exist_ok=True)
        (exp / "summaries.json").write_text(json.dumps(summaries, indent=2))
    return summaries


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("benchmark", help="benchmark name (eval/benchmarks.py) or a dataset dir")
    ap.add_argument("--method", default="uvp", choices=["uvp", "trivial"])
    ap.add_argument("--split", default="test")
    ap.add_argument("--camera_model", default="pinhole")
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    if Path(args.benchmark).is_dir():
        target = Path(args.benchmark)
        name = target.name
    else:
        from geocalib_tpu.eval.benchmarks import prepare_benchmark

        target = prepare_benchmark(args.benchmark)
        name = args.benchmark

    out_dir = Path(args.output) if args.output else EVAL_PATH / f"{name}_{args.method}"
    summary = evaluate_baseline(
        args.method,
        str(target),
        split=args.split,
        camera_model=args.camera_model,
        experiment_dir=str(out_dir),
        max_images=args.max_images,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
