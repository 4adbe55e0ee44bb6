#!/usr/bin/env bash
# Dataset-free demo: the full train -> eval -> video pipeline on the built-in
# procedural scene (no data on disk required). Counterpart of demo_360.sh for
# environments without the nerf_360 dataset; same quality model
# (synthetic_quality preset, config.py QUALITY_MODEL/QUALITY_TRAIN).
#
# Validated live on a TPU v5e (PRESET_VALIDATION_r4.json, reproduced
# bit-for-bit under the r5 staging in PRESET_VALIDATION_r5.json): 31.1 dB
# mean / 0.983 SSIM over 7 honest (all-informative) held-out views after
# 1500 steps at 47.5k rays/s.
# STEPS=10000 (the preset default, the reference demo's operating point)
# reaches the PARITY_PSNR.json "convergence" regime.
set -euo pipefail

CKPT=${CKPT:-log/synthetic_quality}
STEPS=${STEPS:-1500}

python -m mipnerf360_tpu.apps.train --preset synthetic_quality \
    --set train.max_steps="$STEPS" --set train.checkpoint_dir="$CKPT" \
    --set train.log_every=100 --set train.eval_image_every=500

# holdout-view eval at the best-eval checkpoint: PSNR/SSIM + rgb/depth/normals
python -m mipnerf360_tpu.apps.eval --ckpt "$CKPT" --step best \
    --chunk 4096 --depth --normals

# spherical-path video (playable MJPEG .avi when no ffmpeg is available)
python -m mipnerf360_tpu.apps.video --ckpt "$CKPT" --step best --chunk 4096
