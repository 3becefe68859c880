"""Pallas TPU kernels for the hot ops."""

from geocalib_tpu.ops.lm_kernel import lm_system_pallas, pallas_tile  # noqa: F401
