"""Stratified s-space sampling and inverse-CDF hierarchical resampling.

TPU-native counterpart of /root/reference/intern/ray.py:12-57 (inverse-CDF),
:81-116 (stratified s-space sampling) and :118-153 (resampling with weight
blur). Fixed shapes throughout ([B, N+1] edges / [B, N] intervals), explicit
``jax.random`` key threading, and a rank-2 broadcast-compare interval search
that maps onto the VPU (no sorting, no dynamic shapes).

Known reference quirk fixed consciously (SURVEY.md §2.1 micro-quirks): its
randomized branch draws ``u = 2*u + noise`` (ray.py:33) — a typo for stratified
``u + noise``; we implement correct stratified samples by default, with the
typo reproducible behind ``u_typo=True`` (ModelConfig.resample_u_typo) for
quirk-exact parity ablations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .spacing import s_to_t

_F32_EPS = jnp.finfo(jnp.float32).eps


def sorted_piecewise_constant_pdf(key, bins, weights, num_samples: int,
                                  randomized: bool, u_typo: bool = False):
    """Draw samples from the piecewise-constant PDF defined by (bins, weights).

    bins: [..., N+1] sorted edges; weights: [..., N] non-negative.
    Returns samples [..., num_samples], sorted ascending.

    ``u_typo=True`` reproduces the reference's ``u = u + u + noise`` quirk
    (ray.py:33) EXACTLY for ablation studies: u = min(2*base + noise, 1-eps),
    which clamps the upper half of the stratified grid to 1-eps so ~half the
    fine samples pile into the last CDF interval. Default is the correct
    stratified draw.
    """
    # Pad so near-zero weight vectors still define a valid PDF (ray.py:15-19).
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )  # [..., N+1]

    s = 1.0 / num_samples
    if randomized:
        base = jnp.arange(num_samples, dtype=cdf.dtype) * s
        noise = jax.random.uniform(
            key, cdf.shape[:-1] + (num_samples,), dtype=cdf.dtype,
            minval=0.0, maxval=s - _F32_EPS)
        u = jnp.minimum((base + base if u_typo else base) + noise,
                        1.0 - _F32_EPS)
    else:
        u = jnp.linspace(0.0, 1.0 - _F32_EPS, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))

    # Interval search by broadcast compare: mask[..., i, j] = u_j >= cdf_i.
    # For each sample, the highest True row is the left edge of its interval.
    mask = u[..., None, :] >= cdf[..., :, None]

    def find_interval(x):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), axis=-2)
        return x0, x1

    bins_g0, bins_g1 = find_interval(bins)
    cdf_g0, cdf_g1 = find_interval(cdf)

    denom = cdf_g1 - cdf_g0
    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / denom, nan=0.0), 0.0, 1.0)
    return bins_g0 + t * (bins_g1 - bins_g0)


def sample_along_rays(key, near, far, num_samples: int, randomized: bool):
    """Sample ``num_samples + 1`` t-edges uniformly in disparity (s) space.

    Mirrors ray.py:81-116 but returns only the edges; frustum casting lives in
    :mod:`gaussians` so the proposal and NeRF levels share one cast path.

    near/far: [B, 1]. Returns t_vals [B, N+1].
    """
    batch = near.shape[0]
    s_vals = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=near.dtype)
    t_vals = s_to_t(s_vals, near, far)  # [B, N+1] via broadcasting
    if randomized:
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([t_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, (batch, num_samples + 1), dtype=near.dtype)
        t_vals = lower + (upper - lower) * t_rand
    else:
        t_vals = jnp.broadcast_to(t_vals, (batch, num_samples + 1))
    return t_vals


def blur_weights(weights):
    """Max-pool-of-neighbors then average — the proposal weight blur
    (ray.py:137-139), which widens the histogram before resampling."""
    w_pad = jnp.concatenate([weights[..., :1], weights, weights[..., -1:]], axis=-1)
    w_max = jnp.maximum(w_pad[..., :-1], w_pad[..., 1:])
    return 0.5 * (w_max[..., :-1] + w_max[..., 1:])


def resample_along_rays(key, t_vals, weights, randomized: bool,
                        resample_padding: float, u_typo: bool = False):
    """Hierarchical resampling of ``t_vals.shape[-1]`` new edges (ray.py:118-153).

    The weight histogram is blurred, padded, and inverse-CDF sampled. The whole
    op is wrapped in stop_gradient: sampling locations carry no gradients,
    matching the reference's ``torch.no_grad()`` block. ``u_typo`` forwards the
    quirk-exact ablation flag (see sorted_piecewise_constant_pdf).
    """
    w = blur_weights(weights) + resample_padding
    new_t = sorted_piecewise_constant_pdf(
        key, t_vals, w, t_vals.shape[-1], randomized, u_typo=u_typo)
    return jax.lax.stop_gradient(new_t)
