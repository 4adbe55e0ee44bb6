"""Holdout-view evaluation CLI — counterpart of /root/reference/test.py.

Renders every held-out view, writes rgb (+ optional depth/normal) PNGs, and
reports per-image and mean PSNR. Unlike the reference (test.py:48-49, which
uses np.sum of squared error), PSNR here uses the standard per-pixel mean.

    python -m mipnerf360_tpu.apps.eval --preset garden --ckpt ckpt/
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..data import get_dataset
from ..data.viz import to8b, visualize_depth, visualize_normals
from ..models.mipnerf360 import render_image
from ..train.checkpoint import restore_checkpoint
from ..train.state import abstract_train_state
from ..core.rays import rays_to_device
from .common import add_config_args, config_from_args


def _save_png(path: str, img_u8: np.ndarray):
    from PIL import Image

    Image.fromarray(img_u8).save(path)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    add_config_args(ap)
    ap.add_argument("--ckpt", default="", help="checkpoint dir (default: cfg)")
    ap.add_argument("--step", default=None,
                    type=lambda s: int(s) if s.isdigit() else s,
                    help="checkpoint step to load (default: latest), or "
                         "'best' for the best-eval checkpoint kept by the "
                         "trainer. Counterpart of the reference's any-step "
                         "--model_weight_path loading (test.py:34).")
    ap.add_argument("--out", default="", help="output dir (default: ckpt/test)")
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--depth", action="store_true", help="write depth viz")
    ap.add_argument("--normals", action="store_true", help="write normal viz")
    ap.add_argument("--lpips", default="",
                    help="path to lpips_vgg.npz (tools/export_lpips_weights"
                         ".py). LPIPS requires pretrained VGG weights, which "
                         "cannot be bundled in this egress-free build; "
                         "without the file only PSNR/SSIM are reported.")
    args = ap.parse_args()

    # resolve the checkpoint dir first so its saved config.json (written by
    # the trainer) supplies the model architecture without re-typing --set
    pre = config_from_args(args)
    ckpt_dir = args.ckpt or pre.train.checkpoint_dir
    cfg = config_from_args(args, ckpt_dir=ckpt_dir)
    out_dir = args.out or os.path.join(ckpt_dir, "test")
    os.makedirs(out_dir, exist_ok=True)

    template = abstract_train_state(
        jax.random.PRNGKey(cfg.train.seed), cfg.model, cfg.train)
    state = restore_checkpoint(ckpt_dir, template, step=args.step)
    print(f"restored step={int(state.step)} from {ckpt_dir}")

    ds = get_dataset(cfg.data, "test", white_bkgd=cfg.model.white_bkgd)
    from ..parallel.mesh import default_render_mesh

    mesh = default_render_mesh()  # data-parallel rendering across the mesh
    lpips_weights = None
    if args.lpips:
        from ..utils.lpips import load_weights

        lpips_weights = load_weights(args.lpips)
    else:
        print("LPIPS: no --lpips weights file; reporting PSNR/SSIM only "
              "(see tools/export_lpips_weights.py)")
    # Next view's ray upload overlaps the current render (BackgroundStager,
    # the trainer's staging thread; measured +12% at 256x256 views).
    from ..train.trainer import BackgroundStager

    def _stage(i):
        rays_np, pix = ds.image(i)
        return rays_to_device(rays_np), pix

    stager = BackgroundStager(_stage, range(ds.n_images), depth=2)
    psnrs, ssims, lpipss = [], [], []
    try:  # finally-close so a render failure can't leak the staging thread
        for i in range(ds.n_images):
            rays, pix = stager.get()
            rgb, dist, acc = render_image(state.params, cfg.model, rays,
                                          chunk=args.chunk, mesh=mesh)
            rgb = np.asarray(jax.device_get(rgb)).reshape(ds.h, ds.w, 3)
            dist = np.asarray(jax.device_get(dist)).reshape(ds.h, ds.w)
            acc = np.asarray(jax.device_get(acc)).reshape(ds.h, ds.w)

            _save_png(os.path.join(out_dir, f"rgb_{i:04d}.png"), to8b(rgb))
            if args.depth:
                _save_png(os.path.join(out_dir, f"dist_{i:04d}.png"),
                          to8b(visualize_depth(dist, acc, ds.near, ds.far)))
            if args.normals:
                _save_png(os.path.join(out_dir, f"norm_{i:04d}.png"),
                          to8b(visualize_normals(dist, acc)))

            if pix is not None:
                from ..utils import metrics

                target = pix.reshape(ds.h, ds.w, 3)
                psnr = metrics.psnr(rgb, target)
                s = (metrics.ssim(rgb, target)
                     if min(ds.h, ds.w) >= 11 else None)
                psnrs.append(psnr)
                ssims.append(s)
                line = f"[{i + 1}/{ds.n_images}] PSNR={psnr:.2f}"
                if s is not None:
                    line += f" SSIM={s:.4f}"
                if lpips_weights is not None:
                    from ..utils.lpips import lpips

                    lp = float(jax.device_get(
                        lpips(rgb, target, lpips_weights)))
                    lpipss.append(lp)
                    line += f" LPIPS={lp:.4f}"
                print(line)
    finally:
        stager.close()

    if psnrs:
        print(f"mean PSNR over {len(psnrs)} views: {np.mean(psnrs):.3f}")
        if all(s is not None for s in ssims):
            print(f"mean SSIM over {len(ssims)} views: {np.mean(ssims):.4f}")
        if lpipss:
            print(f"mean LPIPS over {len(lpipss)} views: "
                  f"{np.mean(lpipss):.4f}")
        # Machine-readable summary next to the rendered PNGs (tooling /
        # driver consumption; the prints above are the human view).
        import json

        summary = {
            "step": int(state.step),
            "n_views": len(psnrs),
            "mean_psnr": float(np.mean(psnrs)),
            "per_view_psnr": [float(p) for p in psnrs],
        }
        if all(s is not None for s in ssims):
            summary["mean_ssim"] = float(np.mean(ssims))
            summary["per_view_ssim"] = [float(s) for s in ssims]
        if lpipss:
            summary["mean_lpips"] = float(np.mean(lpipss))
        with open(os.path.join(out_dir, "eval.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {os.path.join(out_dir, 'eval.json')}")


if __name__ == "__main__":
    main()
