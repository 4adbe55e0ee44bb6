"""Blender synthetic dataset loader.

Counterpart of /root/reference/dataset.py:174-209 (``Blender``): reads
``transforms_{split}.json`` + PNGs, optional half-res downsample when
factor >= 2, white-background alpha compositing, focal from camera_angle_x;
near=2, far=6 by default.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..config import DataConfig
from .base import RayDataset, flatten_images
from .rays_gen import pinhole_rays


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with open(path, "rb") as f:
        return np.array(Image.open(f), dtype=np.float32) / 255.0


def _downsample_half(img: np.ndarray) -> np.ndarray:
    """2x box-filter downsample (the reference uses cv2.INTER_AREA at fixed
    half resolution for any factor >= 2, dataset.py:192-195)."""
    h, w = (img.shape[0] // 2) * 2, (img.shape[1] // 2) * 2
    img = img[:h, :w]
    return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2] +
                   img[0::2, 1::2] + img[1::2, 1::2])


def load_blender(cfg: DataConfig, split: str = "train",
                 white_bkgd: bool = True) -> RayDataset:
    if split == "render":
        # Synthesized camera path (reference dataset.py:75-89 via the base
        # class; Blender ctor defaults radius=4, radii=1, h=w=800,
        # dataset.py:176) — no images on disk are read.
        from .render_split import render_path_dataset

        return render_path_dataset(cfg)

    if split == "visualize":
        # reference alias: its test.py renders split="visualize", which the
        # base class maps onto the held-out image path (dataset.py:22-24,
        # 59-66); for blender that is the test split.
        split = "test"
    base = cfg.base_dir or os.path.join("data/nerf_synthetic", cfg.scene)
    with open(os.path.join(base, f"transforms_{split}.json")) as fp:
        meta = json.load(fp)

    images, cams = [], []
    for frame in meta["frames"]:
        img = _load_image(os.path.join(base, frame["file_path"] + ".png"))
        if cfg.factor >= 2:
            img = _downsample_half(img)
        images.append(img)
        cams.append(np.array(frame["transform_matrix"], dtype=np.float32))
    images = np.stack(images, 0)
    if white_bkgd and images.shape[-1] == 4:
        images = images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
    else:
        images = images[..., :3]

    h, w = images.shape[1:3]
    cam_to_world = np.stack(cams, 0)[:, :3, :4]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))

    rays = pinhole_rays(cam_to_world, h, w, focal, cfg.near, cfg.far)
    flat_rays, flat_pix = flatten_images(rays, images)
    return RayDataset(rays=flat_rays, pixels=flat_pix, h=h, w=w,
                      near=cfg.near, far=cfg.far, n_images=images.shape[0])
