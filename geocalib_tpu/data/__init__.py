"""Data layer: datasets, augmentations, pano rendering, generation."""

from geocalib_tpu.data.augmentations import AUGMENTATIONS, get_augmentation
from geocalib_tpu.data.dataset import (
    DatasetConf,
    SimpleDataset,
    batch_gt,
    synthesize_gt_fields,
)
from geocalib_tpu.data.generate import generate_dataset
from geocalib_tpu.data.pano import render_from_pano, synthetic_pano

__all__ = [
    "AUGMENTATIONS",
    "get_augmentation",
    "DatasetConf",
    "SimpleDataset",
    "batch_gt",
    "synthesize_gt_fields",
    "generate_dataset",
    "render_from_pano",
    "synthetic_pano",
]
