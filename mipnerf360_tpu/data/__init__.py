"""Data pipeline (L4 of SURVEY.md): loaders, ray generation, pose paths, viz."""
from __future__ import annotations

from ..config import DataConfig
from .base import RayDataset, flatten_images
from .blender import load_blender
from .llff import load_llff
from .synthetic import synthetic_dataset
from .rays_gen import pinhole_rays, ndc_rays
from . import pose, viz


def get_dataset(cfg: DataConfig, split: str = "train",
                white_bkgd: bool | None = None) -> RayDataset:
    """Dataset factory (reference dataset.py:14-16 + config.py:76-83 aliasing).

    ``white_bkgd``: the MODEL's background regime (ModelConfig.white_bkgd),
    when the caller has the full config. The reference couples dataset
    compositing and model compositing through ONE flag (its config.white_bkgd
    feeds both dataset.py:203 and ray.py:184); here the flag lives in
    ModelConfig, so callers must pass it through or the synthetic/blender
    targets keep white backgrounds while the renderer composites empty space
    as black — the degenerate regime data/synthetic.py documents (white fog
    geometry, 40 dB train / 13 dB holdout). None (dataset-only callers,
    e.g. staging-parity tests) keeps the historical white default."""
    name = cfg.dataset
    if name == "synthetic":
        return synthetic_dataset(
            cfg, split, background=0.0 if white_bkgd is False else 1.0)
    if name == "blender":
        return load_blender(cfg, split,
                            white_bkgd=white_bkgd is not False)
    if name == "llff":
        return load_llff(cfg, split, spherify=False,
                         n_render_poses=cfg.n_render_poses)
    if name == "nerf_360":
        # nerf_360 uses the LLFF loader; unbounded handling lives in contract()
        return load_llff(cfg, split, spherify=(split == "render"),
                         n_render_poses=cfg.n_render_poses)
    raise ValueError(f"unknown dataset {name!r}")
