#!/bin/sh
# Round-4 end-game: run AFTER the main v2 training leg is stopped.
# Each stage is independently resumable; everything logs under outputs/.
set -x
cd "$(dirname "$0")/.."

# 1) export the trained pinhole model
python -m geocalib_tpu.training.export outputs/training/geocalib_synth_r04 \
    weights/geocalib_synth_r04.msgpack || exit 1

# 2) DeepCalib baseline (short, on-chip)
python -m geocalib_tpu.training.train_deepcalib deepcalib_r04 \
    data.dataset_dir=data/openpano_synth_v2 train.total_steps=3000 \
    train.eval_every=500 train.save_every=1000 \
    > outputs/train_deepcalib_r04.log 2>&1

# 3) radial fine-tune from the pinhole weights (short, on-chip)
python -m geocalib_tpu.training.train geocalib_radial_r04 --staged \
    data.dataset_dir=data/openpano_radial_v2 data.batch_size=18 \
    data.camera_model=simple_radial \
    train.camera_model=simple_radial train.lr=3e-5 train.warmup_steps=100 \
    train.total_steps=2500 'train.decay_milestones=[2000]' \
    train.eval_every=500 train.save_every=1000 \
    train.init_weights=weights/geocalib_synth_r04.msgpack \
    train.staged_val_rows=512 \
    > outputs/train_radial_r04.log 2>&1
python -m geocalib_tpu.training.export outputs/training/geocalib_radial_r04 \
    weights/geocalib_radial_r04.msgpack

# 4) accuracy tables (geocalib + deepcalib rows on chip; uvp/trivial merged
#    from the precomputed host runs)
cp outputs/results/baselines_v2.json outputs/results/accuracy_table.json
python tools/make_accuracy_table.py \
    --weights weights/geocalib_synth_r04.msgpack \
    --dataset data/openpano_synth_v2 \
    --methods geocalib,deepcalib \
    --deepcalib_weights weights/deepcalib_deepcalib_r04.msgpack \
    --merge_json outputs/results/accuracy_table.json \
    --title "OpenPano-synth-v2 test split (4,096 images, ray-traced 3D scenes)"

cp outputs/results/baselines_radial.json outputs/results/accuracy_radial.json
python tools/make_accuracy_table.py \
    --weights weights/geocalib_radial_r04.msgpack \
    --dataset data/openpano_radial_v2 \
    --camera_model simple_radial \
    --methods geocalib \
    --merge_json outputs/results/accuracy_radial.json \
    --out_json outputs/results/accuracy_radial.json \
    --out_md ACCURACY_radial.md \
    --title "OpenPano-radial-v2 test split (1,024 images, simple_radial)"

# 5) per-stage budget + final bench
python tools/profile_pipeline_budget.py > outputs/profile_budget_r04.log 2>&1
python bench.py | tee outputs/bench_r04_local.json
