"""PSNR-at-equal-iterations parity: reference (PyTorch, CPU) vs this framework.

The reference publishes no numbers (SURVEY.md §6), so we measure it ourselves:

1. Export the procedural sphere scene as a Blender-format dataset (both
   frameworks share the exact pinhole convention — dataset.py:109-134 and
   data/rays_gen.py are term-for-term identical, verified).
2. Train the reference (its default 2+1 cadence, batch 64) for N steps.
3. Train this framework with cadence="reference", same batch/LR/schedule.
4. Record train-PSNR trajectories + final eval PSNR into PARITY_PSNR.json.

Usage: python tools/parity_psnr.py [--steps 150] [--res 32] [--skip-ref]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def export_blender_scene(out_dir: str, res: int, n_train: int = 12,
                         n_test: int = 3):
    from PIL import Image

    from mipnerf360_tpu.data.rays_gen import pinhole_rays
    from mipnerf360_tpu.data.synthetic import _orbit_poses, _shade_sphere

    focal = 0.9 * res
    angle_x = 2.0 * np.arctan(0.5 * res / focal)
    all_poses = _orbit_poses(n_train + n_test)
    splits = {"train": all_poses[:n_train], "test": all_poses[n_train:]}
    for split, poses in splits.items():
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        rays = pinhole_rays(poses, res, res, focal, 2.0, 6.0)
        rgb = _shade_sphere(rays.origins, rays.viewdirs)  # [P, H, W, 3]
        frames = []
        for i in range(len(poses)):
            img = np.concatenate(
                [np.clip(rgb[i] * 255 + 0.5, 0, 255).astype(np.uint8),
                 np.full((res, res, 1), 255, np.uint8)], axis=-1)  # RGBA, a=1
            Image.fromarray(img).save(
                os.path.join(out_dir, split, f"r_{i}.png"))
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :4] = poses[i]
            frames.append({"file_path": f"{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": float(angle_x), "frames": frames}, f)
    return out_dir


def run_reference(scene_dir: str, steps: int, workdir: str):
    """Run /root/reference/train.py on CPU; parse PSNR prints."""
    data_root = os.path.join(workdir, "data", "nerf_synthetic")
    os.makedirs(data_root, exist_ok=True)
    link = os.path.join(data_root, "parity")
    if not os.path.exists(link):
        os.symlink(scene_dir, link)
    log_dir = os.path.join(workdir, "log")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "train.py"),
         "--dataset_name", "blender", "--scene", "parity", "--factor", "1",
         "--device", "cpu", "--max_steps", str(steps),
         "--save_every", str(10 * steps),  # effectively disable torch.save
         "--log_dir", log_dir],
        cwd=workdir, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        raise RuntimeError(f"reference failed:\n{out[-4000:]}")
    # "[step=N]: avg_psnr=X" (running average) / "[step=N]: eval psnr=X"
    train_psnr = {int(m[0]): float(m[1]) for m in
                  re.findall(r"\[step=(\d+)\]: avg_psnr=([\d.eE+-]+)", out)}
    eval_psnr = {int(m[0]): float(m[1]) for m in
                 re.findall(r"\[step=(\d+)\]: eval psnr=([\d.eE+-]+)", out)}
    return train_psnr, eval_psnr, wall


def run_ours(scene_dir: str, steps: int, ckpt_dir: str):
    from mipnerf360_tpu.config import get_config
    from mipnerf360_tpu.train.trainer import train

    cfg = get_config(
        model=dict(white_bkgd=True),
        train=dict(max_steps=steps, batch_size=64, cadence="reference",
                   log_every=10, eval_every=10, save_every=0,
                   checkpoint_dir=ckpt_dir),
        data=dict(dataset="blender", base_dir=scene_dir, factor=1,
                  near=2.0, far=6.0),
    )
    t0 = time.time()
    train(cfg)
    wall = time.time() - t0
    train_psnr, eval_psnr = {}, {}
    with open(os.path.join(ckpt_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "train/avg_psnr" in rec:
                train_psnr[rec["step"]] = rec["train/avg_psnr"]
            if "eval/psnr" in rec:
                eval_psnr[rec["step"]] = rec["eval/psnr"]
    return train_psnr, eval_psnr, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--scene-dir", default="/tmp/parity_scene")
    ap.add_argument("--workdir", default="/tmp/parity_ref")
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    export_blender_scene(args.scene_dir, args.res)
    print(f"exported scene to {args.scene_dir}", flush=True)

    ours_train, ours_eval, ours_wall = run_ours(
        args.scene_dir, args.steps, os.path.join(args.workdir, "ours_ckpt"))
    print(f"ours done in {ours_wall:.1f}s", flush=True)

    result = {
        "steps": args.steps,
        "scene": {"res": args.res, "train_views": 12, "test_views": 3},
        "note": ("train_psnr is the instantaneous per-step batch PSNR on "
                 "both sides (the reference's 'avg_psnr' print is np.mean of "
                 "a single step's scalar, train.py:84-88); eval_psnr is one "
                 "64-ray holdout batch, matching eval_model "
                 "(train.py:106-116). Wall-clock here is NOT a throughput "
                 "benchmark (batch 64, reference cadence); see bench.py."),
        "ours": {
            "train_psnr": ours_train,
            "eval_psnr": ours_eval,
            "wall_s": round(ours_wall, 1),
            "cadence": "reference (2 prop + 1 nerf updates/step, batch 64)",
        },
    }
    if not args.skip_ref:
        ref_train, ref_eval, ref_wall = run_reference(
            args.scene_dir, args.steps, args.workdir)
        print(f"reference done in {ref_wall:.1f}s", flush=True)
        result["reference"] = {
            "train_psnr": ref_train,
            "eval_psnr": ref_eval,
            "wall_s": round(ref_wall, 1),
            "device": "cpu (no CUDA in this environment; RTX 3090 upstream)",
        }

        def last(d):
            return d[max(d)] if d else None

        result["summary"] = {
            "final_train_psnr": {"ours": last(ours_train),
                                 "reference": last(ref_train)},
            "final_eval_psnr": {"ours": last(ours_eval),
                                "reference": last(ref_eval)},
        }
    with open(os.path.join(REPO, "PARITY_PSNR.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result.get("summary", result["ours"]), indent=2))


if __name__ == "__main__":
    main()
