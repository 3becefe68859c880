"""Data generation, dataset loading, pano rendering, eval pipeline, metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geocalib_tpu.data import (
    DatasetConf,
    SimpleDataset,
    generate_dataset,
    render_from_pano,
    synthesize_gt_fields,
    synthetic_pano,
)
from geocalib_tpu.eval import evaluate_benchmark
from geocalib_tpu.eval.metrics import camera_metrics, pixel_projection_errors
from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.models import GeoCalibNet
from geocalib_tpu.utils.tools import AUCMetric, compute_auc, summarize_results


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    out = generate_dataset(
        str(tmp_path_factory.mktemp("ds")), n_panos=4, height=96, width=96,
        crops_per_pano=3,
    )
    return out


def test_synthetic_pano_shape():
    pano = synthetic_pano(seed=1, height=64, width=128)
    assert pano.shape == (64, 128, 3)
    assert pano.min() >= 0 and pano.max() <= 1


def test_render_from_pano_horizon():
    """With zero roll/pitch, the horizon (pano lat=0 seam) must be centered."""
    pano = np.zeros((128, 256, 3), np.float32)
    pano[:64] = 1.0  # one hemisphere bright
    B = 1
    cam = Camera.from_dict(
        {"height": jnp.full((B,), 64.0), "width": jnp.full((B,), 64.0),
         "vfov": jnp.full((B,), 0.9)}
    )
    grav = Gravity.from_rp(jnp.zeros((B,)), jnp.zeros((B,)))
    crop = np.asarray(render_from_pano(jnp.asarray(pano), cam, grav, 0.0))[0]
    col = crop[:, 32, 0]
    # top half bright, bottom half dark (or vice versa) with the flip at center
    flip = int(np.argmin(np.abs(col - 0.5)))
    assert 24 <= flip <= 40, f"horizon at row {flip}, expected near 32"


def test_dataset_epoch_and_sharding(dataset_dir):
    ds = SimpleDataset(
        DatasetConf(dataset_dir=str(dataset_dir), csv_name="train.csv", batch_size=2)
    )
    batches = list(ds.epoch(epoch=0))
    assert batches and batches[0]["image"].shape[0] == 2
    assert batches[0]["gt_params"].shape == (2, 7)
    # sharding covers disjoint subsets
    b0 = list(ds.epoch(epoch=0, shard=0, num_shards=2))
    b1 = list(ds.epoch(epoch=0, shard=1, num_shards=2))
    assert len(b0) + len(b1) <= len(batches) + 1


def test_synthesize_gt_fields(dataset_dir):
    ds = SimpleDataset(
        DatasetConf(dataset_dir=str(dataset_dir), csv_name="train.csv", batch_size=2)
    )
    batch = next(ds.epoch())
    full = synthesize_gt_fields({k: jnp.asarray(v) for k, v in batch.items()})
    assert full["up_field"].shape == (2, 96, 96, 2)
    assert full["latitude_field"].shape == (2, 96, 96, 1)
    # up vectors are unit length
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(full["up_field"]), axis=-1), 1.0, atol=1e-5
    )


def test_eval_pipeline_runs(dataset_dir, tmp_path):
    net = GeoCalibNet(variant="tiny")
    params = net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 96, 96, 3)))
    summ = evaluate_benchmark(
        params, str(dataset_dir), split="test", variant="tiny",
        compute_dtype="float32", batch_size=2, experiment_dir=str(tmp_path / "exp"),
    )
    assert "auc_roll_error@1" in summ and "median_vfov_error" in summ
    assert (tmp_path / "exp" / "results.h5").exists()
    assert (tmp_path / "exp" / "summaries.json").exists()


def test_auc_parity_values():
    # perfect predictions → AUC = 1 at all thresholds with min_error=1
    errors = np.zeros(100)
    assert AUCMetric([1, 5, 10], elements=errors, min_error=1).compute() == [1, 1, 1]
    # all errors at 2deg: auc@1=0 (min_error clamp), auc@10 = 0.8
    errors = np.full(100, 2.0)
    auc = compute_auc(errors, [1, 5, 10], min_error=1)
    assert auc[0] == 0.0
    np.testing.assert_allclose(auc[2], 0.8, atol=0.01)


def test_pixel_projection_error_identical_cameras():
    B = 2
    cam = Camera.from_dict(
        {"height": jnp.full((B,), 64.0), "width": jnp.full((B,), 64.0),
         "vfov": jnp.full((B,), 1.0), "k1": jnp.full((B,), -0.1)},
        model="simple_radial",
    )
    res = pixel_projection_errors(cam, cam, n=16)
    assert float(res["dist"].max()) < 1e-3
    m = camera_metrics(cam, cam)
    assert float(m["pixel_projection_error@1"].min()) > 0.99
