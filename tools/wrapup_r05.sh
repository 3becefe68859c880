#!/bin/sh
# Round-5 end-game: run AFTER the main flagship training leg is stopped.
# Each stage is independently resumable; everything logs under outputs/.
# (r4 lesson: end with git status + add so no round artifact is left
# untracked at snapshot time.)
set -x
cd "$(dirname "$0")/.."

# 1) export the trained pinhole model
python -m geocalib_tpu.training.export outputs/training/geocalib_synth_r04 \
    weights/geocalib_synth_r05.msgpack || exit 1

# 2) radial fine-tune from the pinhole weights (>=20k steps, r4 verdict #3;
#    reference recipe: 200k @ lr 1e-5 from the pinhole ckpt,
#    siclib/configs/geocalib-radial.yaml)
# batch 12 (not the pinhole 24): the radial LM jacobians make the step
# ~35% costlier per image, and the 1e-5-lr fine-tune is insensitive to the
# smaller batch — 12 maximizes steps/hour on the single chip
python -m geocalib_tpu.training.train geocalib_radial_r05 --staged \
    data.dataset_dir=data/openpano_radial_v2 data.batch_size=12 \
    data.camera_model=simple_radial \
    train.camera_model=simple_radial train.lr=1e-5 train.warmup_steps=200 \
    train.total_steps=20000 'train.decay_milestones=[16000]' \
    train.eval_every=2500 train.save_every=4000 train.figures_every=0 \
    train.init_weights=weights/geocalib_synth_r05.msgpack \
    train.staged_subset=8192 train.staged_val_rows=512 \
    > outputs/train_radial_r05.log 2>&1
python -m geocalib_tpu.training.export outputs/training/geocalib_radial_r05 \
    weights/geocalib_radial_r05.msgpack

# 3) DeepCalib baseline, 30k steps with the dark augmentation preset
#    (r4 verdict #7)
python -m geocalib_tpu.training.train_deepcalib deepcalib_r05 \
    data.dataset_dir=data/openpano_synth_v2 train.total_steps=30000 \
    train.eval_every=2000 train.save_every=10000 \
    > outputs/train_deepcalib_r05.log 2>&1

# 4) accuracy tables (host-baseline rows merged from the precomputed runs)
cp outputs/results/baselines_v2.json outputs/results/accuracy_table.json
python tools/make_accuracy_table.py \
    --weights weights/geocalib_synth_r05.msgpack \
    --dataset data/openpano_synth_v2 \
    --methods geocalib,deepcalib \
    --deepcalib_weights weights/deepcalib_deepcalib_r05.msgpack \
    --merge_json outputs/results/accuracy_table.json \
    --compare_json outputs/results/accuracy_table_r04.json \
    --compare_label "GeoCalib-TPU @36k steps (round 4)" \
    --title "OpenPano-synth-v2 test split (4,096 images, ray-traced 3D scenes)"

cp outputs/results/baselines_radial.json outputs/results/accuracy_radial.json
python tools/make_accuracy_table.py \
    --weights weights/geocalib_radial_r05.msgpack \
    --dataset data/openpano_radial_v2 \
    --camera_model simple_radial \
    --methods geocalib \
    --merge_json outputs/results/accuracy_radial.json \
    --out_json outputs/results/accuracy_radial.json \
    --out_md ACCURACY_radial.md \
    --title "OpenPano-radial-v2 test split (1,024 images, simple_radial)"

# 4b) radial checkpoint on the PINHOLE split: the no-regression companion
#     row (the reference ships two checkpoints precisely for this trade-off)
python tools/make_accuracy_table.py \
    --weights weights/geocalib_radial_r05.msgpack \
    --dataset data/openpano_synth_v2 \
    --methods geocalib \
    --out_json outputs/results/accuracy_radial_on_pinhole.json \
    --out_md outputs/results/accuracy_radial_on_pinhole.md \
    --title "Radial checkpoint evaluated on the pinhole test split"

# 5) shared-intrinsics + prior-conditioned section (r4 verdict #8)
python tools/eval_conditioned.py --weights weights/geocalib_synth_r05.msgpack \
    --append ACCURACY.md > outputs/eval_conditioned_r05.log 2>&1

# 6) perf artifacts: winograd tail study, per-stage budget, train budget
python tools/profile_tail_winograd.py > outputs/profile_tail_winograd.log 2>&1
python tools/profile_pipeline_budget.py > outputs/profile_budget_r05.log 2>&1

python tools/profile_train_budget.py --batches 24 --fused-only \
    --out PROFILE_train_fused.json >> outputs/profile_budget_r05.log 2>&1

# 7) final bench
python bench.py | tee outputs/bench_r05_local.json

# 8) hygiene: every round artifact tracked (r4 verdict #9)
git add -A ACCURACY.md ACCURACY_radial.md PROFILE_*.json outputs/results \
    weights/*.msgpack BENCH_*.json MULTICHIP_*.json 2>/dev/null
git status --short
