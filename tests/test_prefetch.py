"""PrefetchLoader: threaded loader must match the sequential epoch exactly."""

import csv

import numpy as np
import pytest

from geocalib_tpu.data.dataset import DatasetConf, PrefetchLoader, SimpleDataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from geocalib_tpu.utils.image import write_image

    root = tmp_path_factory.mktemp("prefetch_ds")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(10):
        img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        write_image(img, root / "images" / f"im{i}.png")
        rows.append(
            {
                "fname": f"im{i}.png",
                "height": 32,
                "width": 32,
                "vfov": 1.0,
                "roll": 0.1 * i,
                "pitch": -0.05 * i,
            }
        )
    with open(root / "train.csv", "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return SimpleDataset(
        DatasetConf(
            dataset_dir=str(root),
            csv_name="train.csv",
            batch_size=3,
            augmentation="geocalib",
            seed=1,
        )
    )


def test_prefetch_matches_sequential(dataset):
    seq = list(dataset.epoch(epoch=2))
    pre = list(PrefetchLoader(dataset, num_workers=4, prefetch=2).epoch(epoch=2))
    assert len(seq) == len(pre) == 3
    for a, b in zip(seq, pre):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["gt_params"], b["gt_params"])


def test_prefetch_early_break_does_not_hang(dataset):
    loader = PrefetchLoader(dataset, num_workers=2, prefetch=1)
    it = loader.epoch(epoch=0)
    next(it)
    it.close()  # must shut the producer down cleanly


def test_prefetch_sharding(dataset):
    full = list(PrefetchLoader(dataset).epoch(epoch=0, shard=0, num_shards=1))
    s0 = list(PrefetchLoader(dataset).epoch(epoch=0, shard=0, num_shards=2))
    s1 = list(PrefetchLoader(dataset).epoch(epoch=0, shard=1, num_shards=2))
    n_full = sum(b["image"].shape[0] for b in full)
    n_split = sum(b["image"].shape[0] for b in s0 + s1)
    assert n_full == 9  # 10 rows, batch 3, tail dropped
    assert n_split == 6  # 5 rows per shard, batch 3 → one batch each
