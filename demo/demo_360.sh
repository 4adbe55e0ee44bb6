#!/usr/bin/env bash
# Canonical CLI recipes (counterpart of reference demo/demo_360.sh:1-8):
# train the nerf_360 garden scene, render the holdout views, make a video.
#
# Uses the garden_quality preset — the paper-faithful model proven to
# converge (PARITY_PSNR.json "convergence"). The plain `garden` preset
# reproduces the reference's quirks byte-for-byte, including the
# non-convergence its own README admits (reference README.md:9); use it only
# for parity studies.
set -euo pipefail

DATA=${DATA:-data/nerf_360/garden}
CKPT=${CKPT:-log/garden}

# train 10k steps (the reference demo's operating point)
python -m mipnerf360_tpu.apps.train --preset garden_quality \
    --set data.base_dir="$DATA" --set train.max_steps=10000 \
    --set train.checkpoint_dir="$CKPT"

# holdout-view eval at the best-eval checkpoint: PSNR + rgb/depth/normals
python -m mipnerf360_tpu.apps.eval --ckpt "$CKPT" --step best --depth --normals

# 360-degree spherical-path video
python -m mipnerf360_tpu.apps.video --ckpt "$CKPT" --step best --depth
