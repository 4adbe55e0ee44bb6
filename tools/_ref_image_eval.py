"""Render the PyTorch reference's holdout images from its saved checkpoints,
using the reference's OWN pipeline (test.py:19-59: get_dataloader("visualize")
+ model.render_image), and score image-level PSNR/SSIM.

Run as a subprocess by tools/parity_psnr.py (isolates the /root/reference
import state from this repo's package):

    python tools/_ref_image_eval.py <scene_dir> <ckpts_json> <out_json>

ckpts_json: {"<step>": "<path to model_<step>.pt>", ...}

Reports per checkpoint:
- image_psnr: proper mean-based PSNR per view (-10 log10(mean(err^2)))
- image_psnr_sum_quirk: the reference's own formula (test.py:48-49 uses
  np.SUM of squared error, not mean — recorded for traceability)
- image_ssim: via this repo's metrics.ssim (same function scoring our side)
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def main():
    scene_dir, ckpts_json, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(ckpts_json) as f:
        ckpts = {int(k): v for k, v in json.load(f).items()}

    sys.path.insert(0, REPO)
    from mipnerf360_tpu.utils import metrics  # scored identically to ours

    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch
    from dataset import get_dataloader
    from model import mipNeRF360

    device = torch.device("cpu")
    # "visualize" split = one image per batch (dataset.py:22-24); the scene
    # export writes transforms_visualize.json mirroring the test split.
    data = get_dataloader("blender", scene_dir, split="visualize", factor=1,
                          device=device)
    # reference config.py defaults (all store_false flags default True;
    # Blender loader composites onto white regardless, dataset.py:176,199-203)
    model = mipNeRF360(
        randomized=True, num_samples=64, hidden_proposal=256,
        hidden_nerf=1024, density_bias=-1.0, rgb_padding=0.001,
        resample_padding=0.01, white_bkgd=True, viewdir_min_deg=0,
        viewdir_max_deg=4, device=device)

    out = {}
    for step in sorted(ckpts):
        model.load_state_dict(torch.load(ckpts[step], map_location="cpu"))
        model.eval()  # also turns off stochastic sampling (model.py:281-283)
        psnrs, psnrs_quirk, ssims = [], [], []
        for index, (rays, pixels) in enumerate(data):
            img, dist, acc = model.render_image(
                rays, data.h, data.w, chunks=4096)
            target = pixels.reshape(data.h, data.w, 3).numpy()
            pred = (img / 255.0).astype(np.float32)
            err2 = (pred - target) ** 2
            psnrs.append(float(-10.0 * np.log10(np.mean(err2))))
            psnrs_quirk.append(float(-10.0 * np.log10(np.sum(err2))))
            ssims.append(float(metrics.ssim(pred, target)))
        out[step] = {
            "image_psnr": float(np.mean(psnrs)),
            "per_view_psnr": psnrs,
            "image_psnr_sum_quirk": float(np.mean(psnrs_quirk)),
            "image_ssim": float(np.mean(ssims)),
        }
        print(f"[ref-eval] step {step}: psnr={out[step]['image_psnr']:.2f} "
              f"ssim={out[step]['image_ssim']:.4f}", flush=True)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
