"""On-device optimization: LM solver, RANSAC, gradient baseline, losses."""

from geocalib_tpu.optim.gradient import GDConfig, GDResult, run_gradient_descent
from geocalib_tpu.optim.lm import (
    LMConfig,
    LMResult,
    get_heuristic_estimation,
    get_trivial_estimation,
    run_lm,
)
from geocalib_tpu.optim.losses import barron_loss, huber_loss, scaled_loss, squared_loss
from geocalib_tpu.optim.ransac import RansacConfig, RansacResult, run_ransac

__all__ = [
    "GDConfig",
    "GDResult",
    "run_gradient_descent",
    "LMConfig",
    "LMResult",
    "get_heuristic_estimation",
    "get_trivial_estimation",
    "run_lm",
    "barron_loss",
    "huber_loss",
    "scaled_loss",
    "squared_loss",
    "RansacConfig",
    "RansacResult",
    "run_ransac",
]
