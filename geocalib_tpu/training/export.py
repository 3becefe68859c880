"""Export a training checkpoint to eval-ready msgpack weights.

The eval pipelines and the extractor load flax-serialized variables
(`extractor.load_params`); training checkpoints are orbax TrainState dirs
(`training/checkpoint.py`). This CLI bridges them — the reference's analog
is `load_experiment` pulling "model" out of a .tar checkpoint
(/root/reference/siclib/utils/experiments.py:66-97).

    python -m geocalib_tpu.training.export outputs/training/exp \
        weights/geocalib_synth.msgpack [--step N | --best]
"""

import argparse
from pathlib import Path

import jax

from geocalib_tpu.extractor import save_params
from geocalib_tpu.training.checkpoint import ExperimentManager
from geocalib_tpu.training.train import make_train_config
from geocalib_tpu.training.train_step import create_train_state
from geocalib_tpu.utils.config import load_yaml


def export_checkpoint(experiment_dir, out_path, step=None, best=False) -> int:
    """Convert an experiment checkpoint to msgpack variables; returns step."""
    exp = Path(experiment_dir)
    conf = load_yaml(exp / "config.yaml")
    cfg = make_train_config(conf)
    size = int(conf["train"].get("input_size", 320))
    # template state on CPU: restore never needs an accelerator
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        _, state = create_train_state(
            jax.random.PRNGKey(0), cfg, (1, size, size, 3)
        )
        manager = ExperimentManager(exp)
        which = "best" if best else ("last" if step is None else step)
        state, got = manager.restore(state, which=which)
        save_params(
            {"params": state.params, "batch_stats": state.batch_stats}, out_path
        )
    return got


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("experiment_dir")
    ap.add_argument("out", help="output .msgpack path")
    ap.add_argument("--step", type=int, default=None, help="checkpoint step (default: latest)")
    ap.add_argument("--best", action="store_true", help="use checkpoint_best")
    args = ap.parse_args()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    step = export_checkpoint(args.experiment_dir, args.out, args.step, args.best)
    print(f"exported step {step} -> {args.out}")


if __name__ == "__main__":
    main()
