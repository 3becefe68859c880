"""One-line model loading from the released cvg/GeoCalib checkpoints.

Re-design of /root/reference/hubconf.py + geocalib/extractor.py:24-40
(torch-hub download): fetch the released PyTorch checkpoint
(`geocalib-{pinhole,distorted}.tar`), convert it to this framework's Flax
variable tree via `geocalib_tpu.models.convert_torch`, cache the converted
params as msgpack, and return a ready `GeoCalib` extractor.

    from geocalib_tpu.hub import load
    calib = load("pinhole")          # or "distorted", or a local .tar/.msgpack
    result = calib.calibrate(image)

Zero-egress environments: download the tar manually and pass its path.
"""

import os
from pathlib import Path
from typing import Any

RELEASE_URL = "https://github.com/cvg/GeoCalib/releases/download/v1.0/geocalib-{name}.tar"
RELEASED = ("pinhole", "distorted")

__all__ = ["load", "cached_params_path"]


def _cache_dir() -> Path:
    root = Path(os.environ.get("GEOCALIB_TPU_CACHE", Path.home() / ".cache" / "geocalib_tpu"))
    root.mkdir(parents=True, exist_ok=True)
    return root


def _download(url: str, dest: Path) -> Path:
    import shutil
    import urllib.request

    print(f"downloading {url} ...")
    try:
        with urllib.request.urlopen(url, timeout=120) as resp, open(dest, "wb") as fh:
            shutil.copyfileobj(resp, fh)
    except Exception as e:
        dest.unlink(missing_ok=True)
        raise RuntimeError(
            f"could not download {url} ({e}); fetch the tar manually and pass its path"
        ) from e
    return dest


def cached_params_path(weights: str = "pinhole") -> Path:
    """Return the path of converted params for a release name or local tar,
    converting (and, for release names, downloading) on first use."""
    if weights in RELEASED:
        tar = _cache_dir() / f"geocalib-{weights}.tar"
        out = _cache_dir() / f"geocalib-{weights}.msgpack"
        if not tar.exists() and not out.exists():
            _download(RELEASE_URL.format(name=weights), tar)
    else:
        tar = Path(weights)
        if not tar.exists():
            raise FileNotFoundError(f"weights {weights!r} is neither a release name nor a file")
        out = _cache_dir() / (tar.stem + ".msgpack")

    if not out.exists():
        from geocalib_tpu.extractor import save_params
        from geocalib_tpu.models.convert_torch import convert_state_dict, load_torch_checkpoint

        variables = convert_state_dict(load_torch_checkpoint(str(tar)))
        save_params(variables, out)
        print(f"converted {tar.name} → {out}")
    return out


def load(weights: str = "pinhole", **kw: Any):
    """Load a ready-to-use GeoCalib extractor.

    weights: "pinhole" | "distorted" | path to a reference .tar or a
    converted .msgpack. Extra kwargs go to `geocalib_tpu.GeoCalib`.
    """
    from geocalib_tpu.extractor import GeoCalib

    path = Path(weights)
    if path.suffix == ".msgpack" and path.exists():
        return GeoCalib(weights=path, **kw)
    return GeoCalib(weights=cached_params_path(weights), **kw)
