"""DeepCalib baseline trainer: loop runs, loss is finite, export loads.

Covers the learned-baseline path the reference always includes in its
accuracy tables (/root/reference/README.md:223; trained via
siclib/configs/deepcalib.yaml through the shared train.py harness).
"""

import json

import numpy as np
import pytest

from geocalib_tpu.data import generate_dataset


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    return generate_dataset(
        str(tmp_path_factory.mktemp("ds")), n_panos=4, height=64, width=64,
        crops_per_pano=4,
    )


def test_deepcalib_trains_and_exports(tiny_ds, tmp_path, monkeypatch):
    from geocalib_tpu.training.train_deepcalib import default_conf, training
    from geocalib_tpu.utils.config import merge

    monkeypatch.chdir(tmp_path)  # keep the weights/ export inside tmp
    conf = merge(
        default_conf,
        {
            "train": {
                "total_steps": 3,
                "warmup_steps": 1,
                "log_every": 1,
                "eval_every": 10,
                "save_every": 10,
                "input_size": 64,
                "num_bins": 16,
                "block_config": [1, 1],
                "growth_rate": 8,
            },
            "data": {"dataset_dir": str(tiny_ds), "batch_size": 4},
        },
    )
    scalars = training(conf, tmp_path / "exp")
    assert np.isfinite(scalars["loss/total"])

    # the export round-trips through the eval-side loader
    from flax import serialization

    path = tmp_path / "weights" / "deepcalib_exp.msgpack"
    payload = serialization.msgpack_restore(path.read_bytes())
    assert payload["conf"]["num_bins"] == 16
    assert "params" in payload and "batch_stats" in payload


def test_deepcalib_baseline_eval(tiny_ds, tmp_path, monkeypatch):
    """evaluate_baseline('deepcalib') produces the standard metric summary."""
    monkeypatch.chdir(tmp_path)
    from geocalib_tpu.training.train_deepcalib import default_conf, training
    from geocalib_tpu.utils.config import merge

    conf = merge(
        default_conf,
        {
            "train": {
                "total_steps": 2,
                "warmup_steps": 1,
                "log_every": 1,
                "eval_every": 10,
                "save_every": 10,
                "input_size": 64,
                "num_bins": 16,
                "block_config": [1, 1],
                "growth_rate": 8,
            },
            "data": {"dataset_dir": str(tiny_ds), "batch_size": 4},
        },
    )
    training(conf, tmp_path / "exp2")

    from geocalib_tpu.eval.baselines_cli import evaluate_baseline

    summary = evaluate_baseline(
        "deepcalib",
        str(tiny_ds),
        split="test",
        weights=str(tmp_path / "weights" / "deepcalib_exp2.msgpack"),
    )
    assert "auc_roll_error@5" in summary or any(
        k.startswith("auc_roll") for k in summary
    ), sorted(summary)
    assert np.isfinite(summary["n_images"]) and summary["n_images"] > 0
    json.dumps(summary)  # serializable
