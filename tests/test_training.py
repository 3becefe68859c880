"""Training loop: SPMD step over the virtual mesh, checkpoint/restore."""

import numpy as np
import pytest

from geocalib_tpu.data import generate_dataset
from geocalib_tpu.training.train import default_conf, training
from geocalib_tpu.utils.config import apply_dotlist, merge


@pytest.fixture(scope="module")
def train_env(tmp_path_factory):
    ds = generate_dataset(
        str(tmp_path_factory.mktemp("ds")), n_panos=5, height=64, width=64,
        crops_per_pano=4,
    )
    out = tmp_path_factory.mktemp("exp")
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
                "save_every": 4,
                "warmup_steps": 2,
                "decay_milestones": [6],
                "lr": 3e-4,
            },
            "data": {"dataset_dir": str(ds), "batch_size": 8},
        },
    )
    return conf, out


def test_training_loss_decreases_and_checkpoints(train_env):
    conf, out = train_env
    import json

    training(conf, str(out))
    log = [
        json.loads(line)
        for line in (out / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [r["loss/total"] for r in log if "loss/total" in r]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert (out / "checkpoint_8").exists() or (out / "checkpoint_4").exists()
    assert (out / "config.yaml").exists()


def test_training_restore_continues(train_env):
    conf, out = train_env
    conf = apply_dotlist(conf, ["train.total_steps=10"])
    scalars = training(conf, str(out), restore=True)
    assert np.isfinite(scalars.get("loss/total", np.nan))
