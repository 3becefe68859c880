#!/bin/sh
# Round-5 endgame as actually executed (wrapup_r05.sh was the pre-round
# runbook; this is the live sequence after the flagship + radial legs).
set -x
cd "$(dirname "$0")/.."

# --best: the batch-12 radial fine-tune is noisy step-to-step; select the
# checkpoint with the lowest staged-val param_total rather than the last
python -m geocalib_tpu.training.export outputs/training/geocalib_radial_r05 \
    weights/geocalib_radial_r05.msgpack --best || exit 1

# main accuracy table: round-5 flagship + deepcalib rows, host baselines
# merged from the precomputed runs, round-4 checkpoint as the compare row
cp outputs/results/baselines_v2.json outputs/results/accuracy_table.json
python tools/make_accuracy_table.py \
    --weights weights/geocalib_synth_r05.msgpack \
    --dataset data/openpano_synth_v2 \
    --methods geocalib,deepcalib \
    --deepcalib_weights weights/deepcalib_deepcalib_r04.msgpack \
    --merge_json outputs/results/accuracy_table.json \
    --compare_json outputs/results/accuracy_table_r04.json \
    --compare_label "GeoCalib-TPU @36k steps (round 4)" \
    --title "OpenPano-synth-v2 test split (4,096 images, ray-traced 3D scenes)" \
    > outputs/acc_main_r05.log 2>&1

# radial table on the radial split
cp outputs/results/baselines_radial.json outputs/results/accuracy_radial.json
python tools/make_accuracy_table.py \
    --weights weights/geocalib_radial_r05.msgpack \
    --dataset data/openpano_radial_v2 \
    --camera_model simple_radial \
    --methods geocalib \
    --merge_json outputs/results/accuracy_radial.json \
    --out_json outputs/results/accuracy_radial.json \
    --out_md ACCURACY_radial.md \
    --title "OpenPano-radial-v2 test split (1,024 images, simple_radial)" \
    > outputs/acc_radial_r05.log 2>&1

# radial checkpoint on the PINHOLE split: the no-regression companion row
python tools/make_accuracy_table.py \
    --weights weights/geocalib_radial_r05.msgpack \
    --dataset data/openpano_synth_v2 \
    --methods geocalib \
    --out_json outputs/results/accuracy_radial_on_pinhole.json \
    --out_md outputs/results/accuracy_radial_on_pinhole.md \
    --title "Radial checkpoint evaluated on the pinhole test split" \
    > outputs/acc_radial_pinhole_r05.log 2>&1

# shared-intrinsics + prior-conditioned section
python tools/eval_conditioned.py --weights weights/geocalib_synth_r05.msgpack \
    --append ACCURACY.md > outputs/eval_conditioned_r05.log 2>&1

git add -A ACCURACY.md ACCURACY_radial.md outputs/results weights/*.msgpack \
    outputs/acc_*_r05.log outputs/eval_conditioned_r05.log 2>/dev/null
git status --short
