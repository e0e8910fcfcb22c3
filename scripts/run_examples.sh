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

# Converted-checkpoint parity dry run on a synthetic-weights stand-in
# (real assets: see docs/PARITY_DRYRUN.md)
python -m hoisdf_tpu.tools.make_standin_ckpt /tmp/standin.npz --setting dexycb --cpu \
    --cfg resnet_type=18 --cfg hidden_dim=64 --cfg dim_feedforward=128 \
    --cfg enc_layers=2 --cfg dec_layers=2 --cfg num_samp_hand=32 \
    --cfg num_samp_obj=16 --cfg 'input_img_shape=[64,64]' \
    --cfg 'output_hm_shape=[32,32,32]' --cfg bins_n=16 --cfg sdf_infer_chunk=2048
python -m hoisdf_tpu.evaluate --setting dexycb --synthetic --cpu --batches 1 \
    --batch-size 2 --torch-ckpt /tmp/standin.npz --out outputs/standin_eval

# Benchmarks
python bench.py --cpu --iters 3   # CPU smoke; drop --cpu on a TPU host
python bench_components.py --cpu --iters 3
