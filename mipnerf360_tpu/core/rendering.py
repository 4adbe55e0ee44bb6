"""Alpha-composite volume rendering.

TPU-native counterpart of /root/reference/intern/ray.py:155-191
(``volumetric_rendering``) and model.py:59-78 (``density_to_weight`` — the
reference duplicates the transmittance math; here there is one implementation
shared by both the proposal and NeRF levels).

The transmittance cumulative sum is associative, so a sharded sample axis can
use ``jax.lax.associative_scan`` — see parallel/ for the multi-chip variant.
"""
from __future__ import annotations

import jax.numpy as jnp


def compute_alpha_weights(density, t_vals, dirs):
    """Density -> per-interval compositing weights.

    density: [..., N] (already activated); t_vals: [..., N+1]; dirs: [..., 3].
    Returns (weights [..., N], trans [..., N]).
    """
    t_dists = t_vals[..., 1:] - t_vals[..., :-1]
    delta = t_dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density * delta

    # -expm1, not 1-exp: the latter underflows to exactly 0 (killing all
    # gradients through alpha) already at density*delta ~ 3e-8, i.e. raw
    # density ~ -16 — reachable within a few optimizer steps when a mostly-
    # background batch pushes density down. expm1 keeps alpha (and its
    # cotangent) alive down to f32 denormals, so a collapsed model can
    # recover instead of dying permanently.
    alpha = -jnp.expm1(-density_delta)
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(density_delta[..., :1]),
         jnp.cumsum(density_delta[..., :-1], axis=-1)], axis=-1))
    return alpha * trans, trans


def composite_outputs(rgb, weights, t_vals, white_bkgd: bool):
    """Reduce per-sample rgb with precomputed weights into per-ray outputs.

    rgb: [..., N, 3]; weights: [..., N]; t_vals: [..., N+1].
    Returns (comp_rgb [..., 3], distance [...], acc [...]).
    """
    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)

    t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
    distance = jnp.sum(weights * t_mids, axis=-1) / acc
    distance = jnp.clip(jnp.nan_to_num(distance, nan=0.0),
                        t_vals[..., 0], t_vals[..., -1])

    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, distance, acc


def volumetric_rendering(rgb, density, t_vals, dirs, white_bkgd: bool):
    """Composite per-sample (rgb, density) into per-ray outputs.

    rgb: [..., N, 3]; density: [..., N]; t_vals: [..., N+1]; dirs: [..., 3].
    Returns (comp_rgb [..., 3], distance [...], acc [...], weights [..., N]).
    """
    weights, _ = compute_alpha_weights(density, t_vals, dirs)
    comp_rgb, distance, acc = composite_outputs(rgb, weights, t_vals, white_bkgd)
    return comp_rgb, distance, acc, weights
