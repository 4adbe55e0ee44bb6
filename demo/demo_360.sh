#!/usr/bin/env bash
# Canonical CLI recipes (counterpart of reference demo/demo_360.sh:1-8):
# train the nerf_360 garden scene, render the holdout views, make a video.
set -euo pipefail

DATA=${DATA:-data/nerf_360/garden}
CKPT=${CKPT:-log/garden}

# train 10k steps (the reference demo's operating point)
python -m mipnerf360_tpu.apps.train --preset garden \
    --set data.base_dir="$DATA" --set train.max_steps=10000 \
    --set train.checkpoint_dir="$CKPT"

# holdout-view eval: PSNR + rgb/depth/normal images
python -m mipnerf360_tpu.apps.eval --ckpt "$CKPT" --depth --normals

# 360-degree spherical-path video
python -m mipnerf360_tpu.apps.video --ckpt "$CKPT" --depth
