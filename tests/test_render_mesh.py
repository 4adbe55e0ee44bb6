"""Mesh-sharded render_image must match the single-device render exactly
(data-parallel eval/video rendering on the virtual 8-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from mipnerf360_tpu.config import ModelConfig
from mipnerf360_tpu.core.rays import dummy_rays, rays_map
from mipnerf360_tpu.models.mipnerf360 import init_model, render_image
from mipnerf360_tpu.parallel.mesh import make_mesh


def _setup():
    cfg = ModelConfig(num_samples=8, hidden_proposal=16, hidden_nerf=32,
                      nerf_depth=2, compute_dtype="float32")
    params = init_model(jax.random.PRNGKey(0), cfg)
    rays = rays_map(jnp.asarray, dummy_rays(200))  # not a multiple of chunk
    return cfg, params, rays


def test_mesh_render_matches_single_device():
    cfg, params, rays = _setup()
    want = render_image(params, cfg, rays, chunk=64)
    mesh = make_mesh(8, 1)
    got = render_image(params, cfg, rays, chunk=64, mesh=mesh)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, rtol=1e-6)


def test_mesh_render_rounds_chunk_to_axis():
    cfg, params, rays = _setup()
    mesh = make_mesh(8, 1)
    # chunk=50 is not divisible by 8 -> rounded up internally; output shape
    # must still be the un-padded ray count.
    rgb, dist, acc = render_image(params, cfg, rays, chunk=50, mesh=mesh)
    assert rgb.shape == (200, 3) and dist.shape == (200,) and acc.shape == (200,)
