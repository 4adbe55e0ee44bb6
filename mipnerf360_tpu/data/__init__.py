"""Data pipeline (L4 of SURVEY.md): loaders, ray generation, pose paths, viz."""
from __future__ import annotations

from ..config import DataConfig
from .base import RayDataset, flatten_images
from .blender import load_blender
from .llff import load_llff
from .synthetic import synthetic_dataset
from .rays_gen import pinhole_rays, ndc_rays
from . import pose, viz


def get_dataset(cfg: DataConfig, split: str = "train") -> RayDataset:
    """Dataset factory (reference dataset.py:14-16 + config.py:76-83 aliasing)."""
    name = cfg.dataset
    if name == "synthetic":
        return synthetic_dataset(cfg, split)
    if name == "blender":
        return load_blender(cfg, split)
    if name == "llff":
        return load_llff(cfg, split, spherify=False,
                         n_render_poses=cfg.n_render_poses)
    if name == "nerf_360":
        # nerf_360 uses the LLFF loader; unbounded handling lives in contract()
        return load_llff(cfg, split, spherify=(split == "render"),
                         n_render_poses=cfg.n_render_poses)
    raise ValueError(f"unknown dataset {name!r}")
