"""Training/eval batch figure factories.

Re-design of /root/reference/siclib/visualization/visualize_batch.py
(make_perspective_figures): compare predicted vs GT fields for the first K
images of a batch — used by the training writer.
"""

from typing import Dict

import numpy as np

from geocalib_tpu.visualization.viz2d import (
    plot_images,
    plot_latitudes,
    plot_vector_fields,
)


def make_up_figure(pred: Dict, data: Dict, n: int = 3):
    """Rows: image + GT up, image + predicted up."""
    imgs = [np.asarray(data["image"][i]) for i in range(min(n, len(data["image"])))]
    fig, axs = plot_images(imgs + imgs, titles=None)
    k = len(imgs)
    plot_vector_fields(axs[:k], [np.asarray(data["up_field"][i]) for i in range(k)])
    plot_vector_fields(
        axs[k:], [np.asarray(pred["up_field"][i]) for i in range(k)], color="#cc3311"
    )
    return {"up_field": fig}


def make_latitude_figure(pred: Dict, data: Dict, n: int = 3):
    imgs = [np.asarray(data["image"][i]) for i in range(min(n, len(data["image"])))]
    fig, axs = plot_images(imgs + imgs)
    k = len(imgs)
    plot_latitudes(axs[:k], [np.asarray(data["latitude_field"][i]) for i in range(k)])
    plot_latitudes(axs[k:], [np.asarray(pred["latitude_field"][i]) for i in range(k)])
    return {"latitude_field": fig}


def make_perspective_figures(pred: Dict, data: Dict, n_pairs: int = 3) -> Dict:
    """All field comparison figures (reference visualize_batch.py:make_...)."""
    figs = {}
    if "up_field" in pred and "up_field" in data:
        figs |= make_up_figure(pred, data, n_pairs)
    if "latitude_field" in pred and "latitude_field" in data:
        figs |= make_latitude_figure(pred, data, n_pairs)
    return figs
