"""Model layer (L3 of SURVEY.md)."""
from .mlp import init_mlp, apply_mlp, init_linear, apply_linear
from .mipnerf360 import (
    init_model,
    prop_forward,
    nerf_forward,
    render_rays,
    render_image,
)
