"""On-device optimization: LM solver, robust losses, tiny linear algebra."""

from geocalib_tpu.optim.lm import LMConfig, LMResult, run_lm
from geocalib_tpu.optim.losses import barron_loss, huber_loss, scaled_loss, squared_loss

__all__ = [
    "LMConfig",
    "LMResult",
    "run_lm",
    "barron_loss",
    "huber_loss",
    "scaled_loss",
    "squared_loss",
]
