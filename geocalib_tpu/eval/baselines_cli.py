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
    weights: str = None,
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
    if len(ds.rows) < ds.conf.batch_size:  # tiny test splits: don't drop all rows
        ds.conf.batch_size = max(1, len(ds.rows))

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

    elif method == "deepcalib":
        # learned baseline (reference README tables always include it,
        # /root/reference/README.md:223): bin-classifier trained by
        # training/train_deepcalib.py; rho decoded back to pitch
        import jax
        from flax import serialization

        from geocalib_tpu.models.deepcalib import DeepCalib
        from geocalib_tpu.utils.conversions import fov2focal, rho2pitch

        assert weights, "deepcalib baseline needs a trained weights path"
        payload = serialization.msgpack_restore(Path(weights).read_bytes())
        net_conf = payload.get("conf", {})
        bc = net_conf.get("block_config", (4, 8, 12, 8))
        if isinstance(bc, dict):  # msgpack round-trips lists as {"0": v, ...}
            bc = [bc[k] for k in sorted(bc, key=int)]
        net = DeepCalib(
            num_bins=int(net_conf.get("num_bins", 256)),
            block_config=tuple(int(x) for x in bc),
            growth_rate=int(net_conf.get("growth_rate", 32)),
        )
        variables = {
            "params": payload["params"], "batch_stats": payload["batch_stats"]
        }

        @jax.jit
        def run(img):
            out = net.apply(variables, img.astype(jnp.bfloat16), train=False)
            return {
                k: v.astype(jnp.float32)
                for k, v in out.items()
                if not k.endswith("_logits")
            }

        def predict(images):
            B = len(images)
            h, w = images.shape[1:3]
            out = run(jnp.asarray(images))
            f = fov2focal(out["vfov"], float(h))
            pitch = rho2pitch(out["rho"], f, float(h))
            cam = Camera.from_dict(
                {
                    "height": jnp.full((B,), float(h)),
                    "width": jnp.full((B,), float(w)),
                    "vfov": out["vfov"],
                }
            )
            grav = Gravity.from_rp(out["roll"], pitch)
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
    ap.add_argument("--method", default="uvp", choices=["uvp", "trivial", "deepcalib"])
    ap.add_argument("--weights", default=None, help="deepcalib weights .msgpack")
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
        weights=args.weights,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
