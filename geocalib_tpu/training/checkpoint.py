"""Experiment checkpointing: save/restore TrainState + config, retention.

Re-design of /root/reference/siclib/utils/experiments.py (torch .tar
checkpoints) on orbax: multi-host-safe pytree checkpoints with best/last
tracking and retention of the most recent K.
"""

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

from geocalib_tpu.utils.config import save_yaml


def _ckpt_dirs(experiment_dir: Path):
    """Numbered checkpoints only (checkpoint_best is excluded from
    retention/latest, like the reference's best-copy, experiments.py:30-50)."""
    return sorted(
        (
            d
            for d in experiment_dir.glob("checkpoint_*")
            if d.is_dir() and d.name.split("_")[-1].isdigit()
        ),
        key=lambda d: int(d.name.split("_")[-1]),
    )


class ExperimentManager:
    """Owns an experiment directory: checkpoints, config, best tracking."""

    def __init__(self, experiment_dir, keep_last: int = 3):
        self.dir = Path(experiment_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_last = keep_last
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------ save ------------------------------ #

    def save(
        self,
        state,
        step: int,
        conf: Optional[Dict[str, Any]] = None,
        eval_results: Optional[Dict[str, float]] = None,
        is_best: bool = False,
    ) -> Path:
        """Save a checkpoint (parity: save_experiment, experiments.py:100-135)."""
        path = self.dir / f"checkpoint_{step}"
        self._ckptr.save((path / "state").absolute(), state, force=True)
        self._ckptr.wait_until_finished()
        meta = {"step": int(step), "eval": eval_results or {}}
        (path / "meta.json").write_text(json.dumps(meta, indent=2))
        if conf is not None:
            save_yaml(conf, path / "config.yaml")
        if is_best:
            best = self.dir / "checkpoint_best"
            if best.exists():
                shutil.rmtree(best)
            shutil.copytree(path, best)
        self._retention()
        return path

    def _retention(self) -> None:
        """Delete all but the newest keep_last step checkpoints
        (parity: delete_old_checkpoints, experiments.py:52-63)."""
        dirs = _ckpt_dirs(self.dir)
        for d in dirs[: -self.keep_last]:
            shutil.rmtree(d)

    # ----------------------------- restore ---------------------------- #

    def latest_step(self) -> Optional[int]:
        dirs = _ckpt_dirs(self.dir)
        return int(dirs[-1].name.split("_")[-1]) if dirs else None

    def restore(self, template_state, which: str = "last") -> Tuple[Any, int]:
        """Restore ("last", "best", or a step int) into template_state's shape."""
        if which == "last":
            step = self.latest_step()
            assert step is not None, f"no checkpoints in {self.dir}"
            path = self.dir / f"checkpoint_{step}"
        elif which == "best":
            path = self.dir / "checkpoint_best"
            assert path.exists(), f"no best checkpoint in {self.dir}"
        else:
            path = self.dir / f"checkpoint_{int(which)}"
        state = self._ckptr.restore((path / "state").absolute(), template_state)
        meta = json.loads((path / "meta.json").read_text())
        return state, int(meta["step"])
