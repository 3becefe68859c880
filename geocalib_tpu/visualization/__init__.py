"""Visualization: matplotlib field/confidence/horizon plotting."""

from geocalib_tpu.visualization.visualize_batch import make_perspective_figures
from geocalib_tpu.visualization.viz2d import (
    plot_confidences,
    plot_horizon_lines,
    plot_images,
    plot_latitudes,
    plot_perspective_fields,
    plot_vector_fields,
    save_plot,
)

__all__ = [
    "make_perspective_figures",
    "plot_confidences",
    "plot_horizon_lines",
    "plot_images",
    "plot_latitudes",
    "plot_perspective_fields",
    "plot_vector_fields",
    "save_plot",
]
