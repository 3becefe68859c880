"""CacheLoader: replay cached h5 predictions as model outputs.

Re-design of /root/reference/siclib/models/cache_loader.py: reads per-image
groups written by export_predictions / the eval pipeline and returns them
as if a model produced them — used to re-run metrics without re-inference.
"""

from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np


class CacheLoader:
    """Read per-image prediction groups from an h5 export."""

    def __init__(self, path: Union[str, Path], keys: Optional[List[str]] = None):
        import h5py

        self.path = Path(path)
        self._file = h5py.File(self.path, "r")
        self.keys = keys

    def names(self) -> List[str]:
        """All prediction-group names, including nested ones.

        Image names containing "/" become nested h5 groups; a plain
        ``keys()`` would list only the top level and silently drop them.
        """
        found: List[str] = []

        def visit(name, obj):
            import h5py

            if isinstance(obj, h5py.Group) and any(
                isinstance(child, h5py.Dataset) for child in obj.values()
            ):
                found.append(name)

        self._file.visititems(visit)
        return found

    def __call__(self, name: str) -> Dict[str, np.ndarray]:
        group = self._file[name]
        keys = self.keys or list(group.keys())
        return {k: np.asarray(group[k]) for k in keys}

    def close(self) -> None:
        self._file.close()


def export_predictions(
    path: Union[str, Path], predictions: Dict[str, Dict[str, np.ndarray]]
) -> None:
    """Write {image_name: {key: array}} as per-image h5 groups
    (parity: siclib/utils/export_predictions.py)."""
    import h5py

    with h5py.File(path, "w") as fh:
        for name, pred in predictions.items():
            group = fh.create_group(name)
            for k, v in pred.items():
                group.create_dataset(k, data=np.asarray(v))
