"""Device-staged training path: store staging, on-device augmentation,
and the fully-on-chip train step (training/device_store.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.data import generate_dataset
from geocalib_tpu.data.device_augment import device_augment
from geocalib_tpu.training.train import default_conf, training
from geocalib_tpu.utils.config import merge


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    return generate_dataset(
        str(tmp_path_factory.mktemp("ds")), n_panos=4, height=64, width=64,
        crops_per_pano=4,
    )


def test_device_augment_statistics():
    """Augmentation keeps range, shape, dtype and perturbs images."""
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    out = jax.jit(device_augment)(img, rng)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # different keys -> different augmentations; same key -> deterministic
    out2 = jax.jit(device_augment)(img, jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    out3 = jax.jit(device_augment)(img, rng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3))
    # the pipeline must actually change the image
    assert float(jnp.abs(out - img).mean()) > 1e-3


def test_store_stage_and_sample(tiny_ds):
    from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset
    from geocalib_tpu.training.device_store import DeviceStore, sample_batch

    ds = SimpleDataset(
        DatasetConf(dataset_dir=str(tiny_ds), csv_name="train.csv", batch_size=4,
                    augmentation="identity")
    )
    store = DeviceStore.stage(ds, chunk_images=3, progress=None)
    assert store.images.shape == (len(ds), 64, 64, 3)
    assert store.images.dtype == jnp.uint8
    assert store.gt_params.shape == (len(ds), 7)
    batch = jax.jit(
        lambda im, gp, r: sample_batch(im, gp, r, 4, augment=False)
    )(store.images, store.gt_params, jax.random.PRNGKey(0))
    assert batch["image"].shape == (4, 64, 64, 3)
    assert float(batch["image"].max()) <= 1.0
    # staged pixels must match the host loader's decode (identity aug)
    row0 = ds._load_row(ds.rows[0], aug_seed=0)["image"]
    np.testing.assert_allclose(
        np.asarray(store.images[0], np.float32) / 255.0, row0, atol=1.5 / 255
    )


def test_staged_training_loss_decreases(tiny_ds, tmp_path):
    import json

    conf = merge(
        default_conf,
        {
            "train": {
                "variant": "tiny",
                "lm_steps": 2,
                "input_size": 64,
                "total_steps": 8,
                "log_every": 2,
                "eval_every": 6,
                "save_every": 8,
                "warmup_steps": 2,
                "decay_milestones": [6],
                "lr": 3e-4,
            },
            "data": {"dataset_dir": str(tiny_ds), "batch_size": 8},
        },
    )
    out = tmp_path / "exp"
    training(conf, str(out), staged=True)
    log = [
        json.loads(line)
        for line in (out / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [r["loss/total"] for r in log if "loss/total" in r]
    assert len(losses) >= 2 and all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert (out / "checkpoint_8").exists()


def test_staged_subset_refresh(tiny_ds, tmp_path):
    """Rotating-subset staging: a store smaller than the dataset restages
    mid-run without recompiling or breaking the step (the HBM-budget path
    used for the 32k-crop v2 dataset)."""
    import json

    conf = merge(
        default_conf,
        {
            "train": {
                "variant": "tiny",
                "lm_steps": 2,
                "input_size": 64,
                "total_steps": 6,
                "log_every": 1,
                "eval_every": 100,
                "save_every": 100,
                "warmup_steps": 2,
                "decay_milestones": [5],
                "lr": 3e-4,
                "staged_subset": 6,  # < the tiny train split
                "staged_refresh_every": 3,
                "staged_val_rows": 4,
            },
            # batch must be divisible over the 8-device test mesh
            "data": {"dataset_dir": str(tiny_ds), "batch_size": 8},
        },
    )
    out = tmp_path / "exp_refresh"
    training(conf, str(out), staged=True)
    log = [
        json.loads(line)
        for line in (out / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [r["loss/total"] for r in log if "loss/total" in r]
    assert len(losses) >= 3 and all(np.isfinite(l) for l in losses)


def test_stage_sharded_content_and_layout(tiny_ds):
    """stage_sharded must lay rows out contiguously per device and match the
    host decode (the multi-process staged path, r4 verdict #6)."""
    from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset
    from geocalib_tpu.parallel.mesh import make_mesh
    from geocalib_tpu.training.device_store import DeviceStore

    ds = SimpleDataset(
        DatasetConf(dataset_dir=str(tiny_ds), csv_name="train.csv", batch_size=4,
                    augmentation="identity")
    )
    mesh = make_mesh()
    n_dev = mesh.devices.size
    store = DeviceStore.stage_sharded(ds, mesh, chunk_images=3, progress=None)
    n = (max(len(ds), n_dev) // n_dev) * n_dev
    assert store.images.shape == (n, 64, 64, 3)
    assert len(store.images.sharding.device_set) == n_dev
    # global row i must equal the host decode of dataset row i
    for i in (0, n - 1):
        src = i % len(ds)
        row = ds._load_row(ds.rows[src], aug_seed=0)["image"]
        np.testing.assert_allclose(
            np.asarray(store.images[i], np.float32) / 255.0, row, atol=1.5 / 255
        )
    # params rows line up with images rows
    assert store.gt_params.shape == (n, 7)
    p0 = np.asarray(store.gt_params[0])
    assert p0[0] == 64 and p0[1] == 64
