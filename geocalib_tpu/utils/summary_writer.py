"""Training-metrics writer facade (tensorboard or JSONL fallback).

Re-design of /root/reference/siclib/utils/summary_writer.py (tensorboard +
wandb facade): same add_scalars-style API; falls back to a plain JSONL
metrics log when tensorboard is unavailable so headless runs always record.
"""

import json
import time
from pathlib import Path
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, log_dir, backend: str = "auto"):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._tb = None
        if backend in ("auto", "tensorboard"):
            try:
                from torch.utils.tensorboard import SummaryWriter as TB

                self._tb = TB(str(self.log_dir))
            except Exception:
                if backend == "tensorboard":
                    raise
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")

    def add_scalars(self, scalars: Dict[str, float], step: int, prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            name = f"{prefix}{k}"
            value = float(v)
            record[name] = value
            if self._tb is not None:
                self._tb.add_scalar(name, value, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def add_text(self, tag: str, text: str, step: int = 0) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, text, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
