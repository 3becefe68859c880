"""Produce the trained-vs-baselines AUC table on the synthetic test split.

Runs the repo's own eval pipelines (the same metric/AUC code for every row,
like the reference computes its README tables through SimplePipeline —
/root/reference/siclib/eval/simple_pipeline.py:359-379) and writes:

- outputs/results/accuracy_table.json  (raw summaries per method)
- ACCURACY.md                          (markdown table)

Usage:
    python tools/make_accuracy_table.py --weights weights/geocalib_synth.msgpack \
        [--dataset data/openpano_synth] [--methods geocalib,uvp,trivial,heuristic]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

METRICS = ("roll_error", "pitch_error", "vfov_error")
THRESH = (1, 5, 10)


def auc_row(summary, metrics=METRICS):
    """AUC cells as percentages (the repo's compute_auc returns fractions;
    the reference README quotes x100 values)."""
    cells = []
    for m in metrics:
        cells.append(
            " / ".join(
                f"{100 * summary.get(f'auc_{m}@{t}', float('nan')):.1f}"
                for t in THRESH
            )
        )
    return cells


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=None, help="trained params .msgpack")
    ap.add_argument("--dataset", default="data/openpano_synth")
    ap.add_argument("--split", default="test")
    ap.add_argument(
        "--methods", default="geocalib,uvp,trivial",
        help="comma list: geocalib,deepcalib,uvp,trivial,heuristic",
    )
    ap.add_argument(
        "--deepcalib_weights", default="weights/deepcalib_deepcalib_r04.msgpack",
        help="trained DeepCalib baseline weights (for --methods deepcalib)",
    )
    ap.add_argument("--out_json", default="outputs/results/accuracy_table.json")
    ap.add_argument("--out_md", default="ACCURACY.md")
    ap.add_argument(
        "--compare_json", default=None,
        help="archived accuracy_table.json whose geocalib row is shown under the live one",
    )
    ap.add_argument("--compare_label", default="GeoCalib-TPU (previous checkpoint)")
    ap.add_argument("--title", default="OpenPano-synth test split")
    ap.add_argument("--camera_model", default="pinhole")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument(
        "--merge_json", default=None,
        help="existing accuracy_table.json whose rows are reused for any "
        "method not in --methods (e.g. precomputed baselines)",
    )
    args = ap.parse_args()

    results = {}
    if args.merge_json and Path(args.merge_json).exists():
        results.update(json.loads(Path(args.merge_json).read_text()))
    for method in args.methods.split(","):
        method = method.strip()
        if method == "geocalib":
            assert args.weights, "--weights required for the geocalib row"
            from geocalib_tpu.eval.pipeline import evaluate_benchmark
            from geocalib_tpu.extractor import load_params

            params = load_params(args.weights)
            summary = evaluate_benchmark(
                params,
                args.dataset,
                split=args.split,
                camera_model=args.camera_model,
                batch_size=args.batch_size,
                compute_dtype=args.compute_dtype,
            )
        else:
            from geocalib_tpu.eval.baselines_cli import evaluate_baseline

            summary = evaluate_baseline(
                method, args.dataset, split=args.split,
                camera_model=args.camera_model,
                weights=args.deepcalib_weights if method == "deepcalib" else None,
            )
        results[method] = summary
        print(f"{method}: " + "  ".join(
            f"{m} AUC@1/5/10 = {c}" for m, c in zip(METRICS, auc_row(summary))
        ), flush=True)

    Path(args.out_json).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out_json).write_text(json.dumps(results, indent=2))

    lines = [
        f"# Accuracy — {args.title}",
        "",
        f"AUC (higher is better) of the error-recall curves at {THRESH} degree",
        "thresholds, computed by `geocalib_tpu.eval` (same protocol as the",
        "reference's README tables; min_error=1). All rows produced by",
        "`tools/make_accuracy_table.py` with the repo's own metric code on",
        f"`{args.dataset}` ({args.split} split).",
        "",
    ]
    has_k1 = any("median_k1_error" in s for s in results.values())
    if has_k1:
        lines += [
            "| Method | Roll AUC@1/5/10 | Pitch AUC@1/5/10 | VFoV AUC@1/5/10 "
            "| median k1 err | px-distortion recall@1px |",
            "|---|---|---|---|---|---|",
        ]
    else:
        lines += [
            "| Method | Roll AUC@1/5/10 | Pitch AUC@1/5/10 | VFoV AUC@1/5/10 |",
            "|---|---|---|---|",
        ]
    display = {
        "geocalib": "**GeoCalib-TPU (trained)**",
        "deepcalib": "DeepCalib (learned baseline, from scratch, no ImageNet pretrain)",
        "uvp": "UVP (native line-based)",
        "trivial": "Trivial init (r=p=0, f=0.7·max(h,w))",
        "heuristic": "Heuristic init",
    }
    order = ["geocalib", "deepcalib", "uvp", "heuristic", "trivial"]
    for method in sorted(results, key=lambda m: order.index(m) if m in order else 99):
        s = results[method]
        cells = auc_row(s)
        if has_k1:
            cells.append(f"{s.get('median_k1_error', float('nan')):.4f}")
            cells.append(
                f"{100 * s.get('mean_pixel_distortion_error@1', float('nan')):.1f}"
            )
        lines.append(f"| {display.get(method, method)} | " + " | ".join(cells) + " |")
        # archived-checkpoint comparison row right under the live model row
        if method == "geocalib" and args.compare_json:
            prev = json.loads(Path(args.compare_json).read_text()).get("geocalib")
            if prev:
                pcells = auc_row(prev)
                if has_k1:
                    pcells.append(f"{prev.get('median_k1_error', float('nan')):.4f}")
                    pcells.append(
                        f"{100 * prev.get('mean_pixel_distortion_error@1', float('nan')):.1f}"
                    )
                lines.append(
                    f"| {args.compare_label} | " + " | ".join(pcells) + " |"
                )
    lines.append("")
    Path(args.out_md).write_text("\n".join(lines))
    print(f"wrote {args.out_json} and {args.out_md}")


if __name__ == "__main__":
    main()
