"""Evaluation pipeline: predict → cache (h5) → metrics → summaries.

Re-design of /root/reference/siclib/eval/eval_pipeline.py +
simple_pipeline.py: batched jitted prediction (the reference runs batch 1
on host loops), per-image metric arrays cached to results.h5, AUC@1/5/10
summaries with min_error=1 (the headline benchmark protocol), summaries to
summaries.json.
"""

import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset, batch_gt
from geocalib_tpu.eval.metrics import camera_metrics, gravity_metrics
from geocalib_tpu.models import GeoCalibNet
from geocalib_tpu.optim.lm import LMConfig, run_lm
from geocalib_tpu.utils.tools import summarize_results


@dataclasses.dataclass
class EvalConf:
    camera_model: str = "pinhole"
    batch_size: int = 8
    thresholds: tuple = (1.0, 5.0, 10.0)
    compute_dtype: str = "bfloat16"
    variant: str = "b"
    # run both decoder heads as one 128-channel tower (models/fused_heads.py;
    # parity-tested, ~1.2x end-to-end). Only applies to the stock GeoCalibNet;
    # a custom `net` instance falls back to net.apply.
    fused_heads: bool = True
    # also write per-image prediction groups (fields, confidences, camera/
    # gravity params) to predictions.h5 — feeds CacheLoader + the inspector
    # (parity: siclib/utils/export_predictions.py)
    cache_fields: bool = False


def _net_apply_fn(conf: "EvalConf", net: Optional[GeoCalibNet], custom_net: bool):
    """fields = fn(params, image): fused tower for the stock net, else apply."""
    if conf.fused_heads and not custom_net:
        from geocalib_tpu.models.fused_heads import fused_forward

        return lambda p, image: fused_forward(p, image, conf.variant)
    return net.apply


class SimplePipeline:
    """Evaluate a (net, params) pair on a SimpleDataset split."""

    def __init__(self, params, conf: Optional[EvalConf] = None, net: Optional[GeoCalibNet] = None):
        self.conf = conf or EvalConf()
        custom = net is not None
        self.net = net or GeoCalibNet(variant=self.conf.variant)
        self._apply = _net_apply_fn(self.conf, self.net, custom)
        self.params = params
        self._predict = None

    def _make_predict(self):
        cfg = LMConfig(camera_model=self.conf.camera_model)
        dtype = jnp.dtype(self.conf.compute_dtype)
        with_cache = self.conf.cache_fields  # static at trace time
        apply_net = self._apply

        @jax.jit
        def predict(params, image, gt_params):
            p = jax.tree.map(lambda x: x.astype(dtype), params)
            fields = apply_net(p, image.astype(dtype))
            fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
            res = run_lm(dict(fields), cfg)
            cam_gt, grav_gt = batch_gt({"gt_params": gt_params}, self.conf.camera_model)
            out = camera_metrics(res.camera, cam_gt)
            out |= gravity_metrics(res.gravity, grav_gt)
            out |= {k: v for k, v in res.info.items() if v.ndim <= 1}
            cache = {}
            if with_cache:  # avoid device memory + transfer when unused
                cache = {
                    "up_field": fields["up_field"],
                    "latitude_field": fields["latitude_field"],
                    "roll": res.gravity.rp[..., 0],
                    "pitch": res.gravity.rp[..., 1],
                    "vfov": res.camera.vfov,
                }
                for k in ("up_confidence", "latitude_confidence"):
                    if k in fields:
                        cache[k] = fields[k]
            return out, cache

        return predict

    def run(
        self,
        dataset: SimpleDataset,
        experiment_dir: Optional[str] = None,
        max_batches: Optional[int] = None,
    ) -> Dict[str, float]:
        """Returns summary dict; writes results.h5 + summaries.json if a dir is given."""
        if self._predict is None:
            self._predict = self._make_predict()

        results: Dict[str, list] = {}
        names: list = []
        cached_preds: Dict[str, Dict[str, np.ndarray]] = {}
        for i, batch in enumerate(dataset.epoch(epoch=0)):
            if max_batches is not None and i >= max_batches:
                break
            out, cache = self._predict(
                self.params, jnp.asarray(batch["image"]), jnp.asarray(batch["gt_params"])
            )
            for k, v in out.items():
                results.setdefault(k, []).append(np.asarray(v))
            batch_names = batch.get(
                "names", [f"image_{i * dataset.conf.batch_size + j}" for j in range(len(batch["image"]))]
            )
            names.extend(batch_names)
            if self.conf.cache_fields and experiment_dir is not None:
                cache_np = {k: np.asarray(v) for k, v in cache.items()}
                for j, name in enumerate(batch_names):
                    cached_preds[name] = {k: v[j] for k, v in cache_np.items()}

        results_np = {k: np.concatenate(v) for k, v in results.items()}
        summaries = summarize_results(results_np, self.conf.thresholds)

        if experiment_dir is not None:
            exp = Path(experiment_dir)
            exp.mkdir(parents=True, exist_ok=True)
            import h5py

            with h5py.File(exp / "results.h5", "w") as fh:
                for k, v in results_np.items():
                    fh.create_dataset(k, data=v)
                fh.create_dataset(
                    "names", data=np.array([str(n).encode("utf-8") for n in names])
                )
            (exp / "summaries.json").write_text(json.dumps(summaries, indent=2))
            if cached_preds:
                from geocalib_tpu.models.cache_loader import export_predictions

                export_predictions(exp / "predictions.h5", cached_preds)
        return summaries


class BenchmarkPipeline:
    """Evaluate on a real variable-size benchmark (lamar2k zip layout).

    Matches the reference protocol (siclib/eval/simple_pipeline.py:198-379,
    eval/lamar2k.py:29-32): every image preprocessed (resize short side 320,
    crop /32), model + LM run in the scaled space, the predicted camera
    mapped back with undo_scale_crop, and ALL camera metrics computed in
    ORIGINAL pixel space against the CSV ground truth. Batches are
    shape-bucketed (data/benchmark.py) so jit compiles once per aspect
    bucket instead of once per image size.
    """

    def __init__(self, params, conf: Optional[EvalConf] = None, net: Optional[GeoCalibNet] = None):
        self.conf = conf or EvalConf()
        custom = net is not None
        self.net = net or GeoCalibNet(variant=self.conf.variant)
        self._apply = _net_apply_fn(self.conf, self.net, custom)
        self.params = params
        self._predict = None

    def _make_predict(self):
        from geocalib_tpu.geometry.camera import Camera
        from geocalib_tpu.geometry.gravity import Gravity

        cfg = LMConfig(camera_model=self.conf.camera_model)
        dtype = jnp.dtype(self.conf.compute_dtype)
        apply_net = self._apply

        @jax.jit
        def predict(params, image, gt_cam, gt_rp, scales, crop_pad):
            p = jax.tree.map(lambda x: x.astype(dtype), params)
            fields = apply_net(p, image.astype(dtype))
            fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
            res = run_lm(dict(fields), cfg)

            # back to original pixel space (simple_pipeline.py:281-282)
            records = {"scales": scales, "crop_pad": crop_pad}
            cam_pred = res.camera.undo_scale_crop(records)
            cam_gt = Camera.from_data(gt_cam, model=self.conf.camera_model)
            grav_gt = Gravity.from_rp(gt_rp[:, 0], gt_rp[:, 1])

            out = camera_metrics(cam_pred, cam_gt)
            out |= gravity_metrics(res.gravity, grav_gt)
            out |= {k: v for k, v in res.info.items() if v.ndim <= 1}
            out |= {
                "roll_gt": jnp.degrees(grav_gt.roll),
                "pitch_gt": jnp.degrees(grav_gt.pitch),
                "vfov_gt": jnp.degrees(cam_gt.vfov),
                "focal_gt": cam_gt.f[..., 1],
            }
            return out

        return predict

    def run(
        self,
        dataset,
        experiment_dir: Optional[str] = None,
        max_batches: Optional[int] = None,
    ) -> Dict[str, float]:
        """Returns the summary dict; writes results.h5 + summaries.json."""
        if self._predict is None:
            self._predict = self._make_predict()

        results: Dict[str, list] = {}
        names: list = []
        for i, batch in enumerate(dataset.batches()):
            if max_batches is not None and i >= max_batches:
                break
            out = self._predict(
                self.params,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["gt_cam"]),
                jnp.asarray(batch["gt_rp"]),
                jnp.asarray(batch["scales"]),
                jnp.asarray(batch["crop_pad"]),
            )
            valid = batch["valid"]
            for k, v in out.items():
                results.setdefault(k, []).append(np.asarray(v)[valid])
            names.extend(n for n, ok in zip(batch["names"], valid) if ok)

        results_np = {k: np.concatenate(v) for k, v in results.items()}
        summaries = summarize_results(results_np, self.conf.thresholds)

        if experiment_dir is not None:
            exp = Path(experiment_dir)
            exp.mkdir(parents=True, exist_ok=True)
            import h5py

            with h5py.File(exp / "results.h5", "w") as fh:
                for k, v in results_np.items():
                    fh.create_dataset(k, data=v)
                fh.create_dataset(
                    "names", data=np.array([str(n).encode("utf-8") for n in names])
                )
            (exp / "summaries.json").write_text(json.dumps(summaries, indent=2))
        return summaries


def evaluate_real_benchmark(
    params,
    dataset_dir: str,
    camera_model: str = "pinhole",
    experiment_dir: Optional[str] = None,
    csv_name: str = "images.csv",
    resize: Optional[int] = 320,
    **conf_kw,
) -> Dict[str, float]:
    """Evaluate on a downloaded benchmark zip dir (variable-size images)."""
    from geocalib_tpu.data.benchmark import BenchmarkDataConf, BenchmarkDataset

    conf = EvalConf(camera_model=camera_model, **conf_kw)
    ds = BenchmarkDataset(
        BenchmarkDataConf(
            dataset_dir=dataset_dir,
            csv_name=csv_name,
            batch_size=conf.batch_size,
            resize=resize,
        )
    )
    return BenchmarkPipeline(params, conf).run(ds, experiment_dir)


def evaluate_benchmark(
    params,
    dataset_dir: str,
    split: str = "test",
    camera_model: str = "pinhole",
    experiment_dir: Optional[str] = None,
    **conf_kw,
) -> Dict[str, float]:
    """Convenience entry: evaluate a params pytree on a generated benchmark."""
    conf = EvalConf(camera_model=camera_model, **conf_kw)
    ds = SimpleDataset(
        DatasetConf(
            dataset_dir=dataset_dir,
            csv_name=f"{split}.csv",
            batch_size=conf.batch_size,
            shuffle=False,
            camera_model=camera_model,
            return_names=True,
        )
    )
    return SimplePipeline(params, conf).run(ds, experiment_dir)
