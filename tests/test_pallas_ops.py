"""Parity tests: Pallas TPU kernels vs their jnp core references.

Run in Pallas interpret mode on the CPU test backend — same kernel code,
interpreted — so the numerics (not the Mosaic compilation) are what's checked
here. The real-TPU compile/execute is exercised by bench.py on hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mipnerf360_tpu.core.rendering import compute_alpha_weights
from mipnerf360_tpu.core.sampling import resample_along_rays
from mipnerf360_tpu.ops.pallas.composite import composite_weights


def _rays(b=300, n=64, seed=0):
    rng = np.random.default_rng(seed)
    density = jnp.asarray(rng.uniform(0.0, 3.0, (b, n)).astype(np.float32))
    t_vals = jnp.asarray(
        np.sort(rng.uniform(0.1, 6.0, (b, n + 1)).astype(np.float32), axis=-1))
    dirs = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
    return density, t_vals, dirs


def test_composite_forward_matches_core():
    density, t_vals, dirs = _rays()
    with pltpu.force_tpu_interpret_mode():
        w_pallas = composite_weights(density, t_vals, dirs)
    w_ref, _ = compute_alpha_weights(density, t_vals, dirs)
    np.testing.assert_allclose(w_pallas, w_ref, rtol=1e-5, atol=1e-6)


def test_composite_backward_matches_core():
    density, t_vals, dirs = _rays(b=64)
    tgt = jnp.asarray(
        np.random.default_rng(1).uniform(size=(64, 64)).astype(np.float32))

    def loss_pallas(d):
        w = composite_weights(d, t_vals, dirs)
        return jnp.sum((w - tgt) ** 2) + jnp.sum(w * tgt)

    def loss_ref(d):
        w, _ = compute_alpha_weights(d, t_vals, dirs)
        return jnp.sum((w - tgt) ** 2) + jnp.sum(w * tgt)

    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(loss_pallas)(density)
    g_ref = jax.grad(loss_ref)(density)
    np.testing.assert_allclose(g_pallas, g_ref, rtol=1e-4, atol=1e-5)


def test_composite_padding_rows_dropped():
    # b=300 is not a multiple of the 256-ray tile; padded rows must not leak.
    density, t_vals, dirs = _rays(b=300)
    with pltpu.force_tpu_interpret_mode():
        w = composite_weights(density, t_vals, dirs)
    assert w.shape == (300, 64)
    assert bool(jnp.all(jnp.isfinite(w)))


def test_model_paths_agree():
    """Full two-level forward: use_pallas=on (interpret) vs off."""
    import dataclasses

    from mipnerf360_tpu.config import ModelConfig
    from mipnerf360_tpu.core.rays import dummy_rays, rays_map
    from mipnerf360_tpu.models.mipnerf360 import init_model, render_rays

    cfg = ModelConfig(num_samples=16, hidden_proposal=32, hidden_nerf=32,
                      nerf_depth=2, compute_dtype="float32", use_pallas="off")
    params = init_model(jax.random.PRNGKey(0), cfg)
    rays = rays_map(jnp.asarray, dummy_rays(48))
    key = jax.random.PRNGKey(5)

    out_ref = render_rays(params, cfg, rays, key, randomized=True)
    cfg_on = dataclasses.replace(cfg, use_pallas="on")
    with pltpu.force_tpu_interpret_mode():
        out_pallas = render_rays(params, cfg_on, rays, key, randomized=True)

    for k in ("rgb", "distance", "acc", "t_vals", "weights"):
        np.testing.assert_allclose(out_pallas[k], out_ref[k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)
