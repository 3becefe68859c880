"""Benchmark registry + download/extract + per-benchmark CLI.

Re-design of /root/reference/siclib/eval/{lamar2k,megadepth2k,tartanair,
stanford2d3d,openpano}.py + eval/utils.py: each benchmark is a config row
(data dir, download URL, eval camera model); `prepare_benchmark` fetches
and extracts the zip on first use. The reference ships these as per-file
EvalPipeline subclasses; here one registry + the SimplePipeline covers all.

The released benchmark zips contain an `images/` dir + a CSV of GT rows —
the same layout SimpleDataset reads. `openpano_synth` is generated locally
from procedural panoramas so evaluation runs without network access.

CLI:
    python -m geocalib_tpu.eval.benchmarks lamar2k --weights params.msgpack
    python -m geocalib_tpu.eval.benchmarks openpano_synth  # no download
"""

import argparse
import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional

DATA_PATH = Path("data")
EVAL_PATH = Path("outputs/results")


@dataclasses.dataclass(frozen=True)
class Benchmark:
    name: str
    url: Optional[str]
    camera_model: str = "pinhole"
    # real zips ship images/ + images.csv with variable-size images
    # (reference eval/lamar2k.py:27-28); generated sets use split CSVs
    csv_name: str = "images.csv"
    # Stanford2D3D requires accepting the dataset terms (reference
    # eval/utils.py:25-38)
    requires_terms: bool = False

    @property
    def variable_size(self) -> bool:
        """Real downloads mix image sizes → shape-bucketed eval path."""
        return self.url is not None


BENCHMARKS: Dict[str, Benchmark] = {
    "lamar2k": Benchmark(
        "lamar2k", "https://cvg-data.inf.ethz.ch/GeoCalib_ECCV2024/lamar2k.zip"
    ),
    "megadepth2k": Benchmark(
        "megadepth2k", "https://cvg-data.inf.ethz.ch/GeoCalib_ECCV2024/megadepth2k.zip"
    ),
    "megadepth2k_radial": Benchmark(
        "megadepth2k_radial",
        "https://cvg-data.inf.ethz.ch/GeoCalib_ECCV2024/megadepth2k-radial.zip",
        camera_model="simple_radial",
    ),
    "tartanair": Benchmark(
        "tartanair", "https://cvg-data.inf.ethz.ch/GeoCalib_ECCV2024/tartanair.zip"
    ),
    "stanford2d3d": Benchmark(
        "stanford2d3d",
        "https://cvg-data.inf.ethz.ch/GeoCalib_ECCV2024/stanford2d3d.zip",
        requires_terms=True,
    ),
    # generated from OpenPano panos
    "openpano": Benchmark("openpano", None, csv_name="test.csv"),
    "openpano_radial": Benchmark(
        "openpano_radial", None, camera_model="simple_radial", csv_name="test.csv"
    ),
    # fully procedural (no network needed)
    "openpano_synth": Benchmark("openpano_synth", None, csv_name="test.csv"),
}


def prepare_benchmark(name: str, data_path: Path = DATA_PATH) -> Path:
    """Ensure the benchmark data exists locally; download/generate if needed."""
    bench = BENCHMARKS[name]
    target = data_path / bench.name
    if (target / bench.csv_name).exists():
        return target

    if bench.name == "openpano_synth":
        from geocalib_tpu.data.generate import generate_dataset

        camera_model = bench.camera_model
        generate_dataset(
            str(target), n_panos=24, camera_model=camera_model, height=320, width=320
        )
        return target

    if bench.url is None:
        raise FileNotFoundError(
            f"benchmark {name!r} must be generated from panoramas first; run "
            f"python -m geocalib_tpu.data.generate --out_dir {target} "
            f"--pano_dir <openpano panos>"
        )

    if bench.requires_terms:
        print(
            "NOTE: Stanford2D3D requires accepting the dataset terms of use: "
            "https://docs.google.com/forms/d/e/1FAIpQLScFR0U8WEUtb7tgjOhhnl31OrkEs73-Y8bQwPeXgebqVKNMpQ/viewform"
        )

    import io
    import urllib.request
    import zipfile

    target.parent.mkdir(parents=True, exist_ok=True)
    print(f"downloading {bench.url} ...")
    try:
        with urllib.request.urlopen(bench.url, timeout=60) as resp:
            payload = resp.read()
    except Exception as e:  # zero-egress environments
        raise RuntimeError(
            f"could not download {bench.url} ({e}); fetch the zip manually and "
            f"extract it to {target}"
        ) from e
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        zf.extractall(target.parent)
    return target


def run_benchmark(
    name: str,
    params,
    data_path: Path = DATA_PATH,
    experiment_dir: Optional[Path] = None,
    **eval_kw,
) -> Dict[str, float]:
    """Prepare + evaluate a benchmark; returns the summary dict."""
    from geocalib_tpu.eval.pipeline import evaluate_benchmark, evaluate_real_benchmark

    bench = BENCHMARKS[name]
    target = prepare_benchmark(name, data_path)
    if bench.variable_size:
        return evaluate_real_benchmark(
            params,
            str(target),
            camera_model=bench.camera_model,
            experiment_dir=str(experiment_dir) if experiment_dir else None,
            csv_name=bench.csv_name,
            **eval_kw,
        )
    return evaluate_benchmark(
        params,
        str(target),
        split=bench.csv_name.replace(".csv", ""),
        camera_model=bench.camera_model,
        experiment_dir=str(experiment_dir) if experiment_dir else None,
        **eval_kw,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("benchmark", choices=sorted(BENCHMARKS))
    ap.add_argument("--weights", default=None, help="params .msgpack (random if omitted)")
    ap.add_argument("--variant", default="b")
    ap.add_argument("--data_path", default=str(DATA_PATH))
    ap.add_argument("--output", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geocalib_tpu.extractor import load_params
    from geocalib_tpu.models import GeoCalibNet

    if args.weights:
        params = load_params(args.weights, variant=args.variant)
    else:
        print("WARNING: no --weights given; evaluating a randomly initialized net")
        net = GeoCalibNet(variant=args.variant)
        params = jax.jit(net.init)(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 320, 320, 3))
        )

    out_dir = Path(args.output) if args.output else EVAL_PATH / args.benchmark
    summary = run_benchmark(
        args.benchmark,
        params,
        data_path=Path(args.data_path),
        experiment_dir=out_dir,
        variant=args.variant,
        batch_size=args.batch_size,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
