"""Regenerate the golden render snapshot used by tests/test_checks.py.

Run on CPU (the test environment's backend) so the snapshot matches CI:
    JAX_PLATFORMS=cpu python tools/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mipnerf360_tpu.config import ModelConfig
from mipnerf360_tpu.core.rays import dummy_rays, rays_map
from mipnerf360_tpu.models.mipnerf360 import init_model, render_rays


def main():
    cfg = ModelConfig(num_samples=16, hidden_proposal=16, hidden_nerf=32,
                      nerf_depth=2, compute_dtype="float32", use_pallas="off")
    params = init_model(jax.random.PRNGKey(42), cfg)
    rays = rays_map(jnp.asarray, dummy_rays(64))
    out = render_rays(params, cfg, rays, jax.random.PRNGKey(7),
                      randomized=False)
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                        "render_8x8.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, rgb=np.asarray(out["rgb"]),
             distance=np.asarray(out["distance"]))
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
