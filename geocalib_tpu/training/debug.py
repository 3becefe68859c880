"""Training debug tools: NaN anomaly detection + missing-gradient audit.

Re-design of the reference's debug aids (/root/reference/siclib/train.py:
342-344 `torch.autograd.set_detect_anomaly` and :496-505 the
"parameters with no gradient" audit after backward):

- ``detect_anomaly()``: context manager flipping ``jax_debug_nans`` /
  ``jax_debug_infs`` so the first non-finite intermediate raises with a
  traceback into the offending primitive (the XLA equivalent of torch's
  anomaly mode; it disables some fusions — debug only, like the reference
  warns).
- ``audit_gradients(grads)``: flags parameters whose gradients are
  identically zero, the functional-JAX analog of "param.grad is None" —
  in jax grads always exist, a disconnected parameter shows up as an
  exactly-zero leaf instead.
"""

import contextlib
from typing import Any, List

import jax
import numpy as np


@contextlib.contextmanager
def detect_anomaly(nans: bool = True, infs: bool = True):
    """Raise on the first NaN/Inf produced inside jitted computations."""
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_debug_infs", infs)
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def audit_gradients(grads: Any) -> List[str]:
    """Paths of gradient leaves that are identically zero.

    Run once after the first training step: an all-zero gradient means the
    parameter is disconnected from the loss (reference audit:
    siclib/train.py:496-505 logs params with no grad after backward).
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    dead = []
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if arr.size and float(np.abs(arr).max()) == 0.0:
            dead.append(jax.tree_util.keystr(path))
    return dead
