"""Profiling/tracing harness.

Re-design of the reference's torch.profiler hooks
(/root/reference/siclib/train.py:383-398) and ad-hoc wall timing
(geocalib/lm_optimizer.py:652-656) for JAX/TPU: Perfetto traces via
jax.profiler plus a fetch-synced timing helper (through remote-TPU relays
block_until_ready can return before execution completes, so timing must
round-trip a result to the host).
"""

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a Perfetto/XPlane trace of the enclosed block.

    View with tensorboard (profile plugin) or ui.perfetto.dev.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> None:
    """Force real completion by fetching one leaf to the host."""
    import jax

    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(leaves[0])


def benchmark_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    label: str = "fn",
) -> Dict[str, float]:
    """Wall-time a jitted callable with host-fetch syncing.

    Returns {label, mean_ms, p50_ms, min_ms, iters}.
    """
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append((time.perf_counter() - t0) * 1000.0)
    times = np.asarray(times)
    return {
        "label": label,
        "mean_ms": float(times.mean()),
        "p50_ms": float(np.median(times)),
        "min_ms": float(times.min()),
        "iters": iters,
    }


class Timer:
    """`with Timer("step") as t: ...` wall timer (reference tools.py Timer)."""

    def __init__(self, name: Optional[str] = None):
        self.name = name

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self.start
        if self.name:
            print(f"[{self.name}] {self.duration:.3f} s")
