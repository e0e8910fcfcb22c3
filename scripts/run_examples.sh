#!/usr/bin/env bash
# Example command lines (the reference's run.sh equivalent; that script
# references nonexistent files, run.sh:3-11 — these all work).
set -e

# DexYCB training (2 epochs synthetic smoke; drop --synthetic with real data)
python -m hoisdf_tpu.train_loop --setting dexycb --run_dir_name dexycb_run \
    --synthetic --end_epoch 2 --iters-per-epoch 4 --point_sampling_epoch 1

# Resume
python -m hoisdf_tpu.train_loop --setting dexycb --run_dir_name dexycb_run \
    --synthetic --end_epoch 3 --iters-per-epoch 4 --point_sampling_epoch 1 --continue

# Evaluation -> results.txt
python -m hoisdf_tpu.evaluate --setting dexycb --synthetic --out outputs/dexycb_eval

# HO3D with rendered-data extension + IK head
python -m hoisdf_tpu.train_loop --setting ho3d_render --run_dir_name ho3d_run \
    --synthetic --end_epoch 1 --iters-per-epoch 2

# Convert a reference checkpoint
# python -m hoisdf_tpu.tools.convert_torch_ckpt snapshot_69_0.pth.tar out/ --setting dexycb

# Benchmarks
python bench.py --cpu --iters 3   # CPU smoke; drop --cpu on a TPU host
python bench_components.py --cpu --iters 3
