"""Integrated positional encoding (IPE) and view-direction encoding.

TPU-native counterpart of /root/reference/intern/encoding.py.

The position encoder projects contracted means through the fixed 21-row basis
of icosahedral directions from the Mip-NeRF 360 paper (encoding.py:9-30) and
attenuates by exp(-sigma/2) where sigma_k = p_k^T Sigma p_k. The paper's 2^i
frequency scaling of P is applied for i in [ipe_min_deg, ipe_max_deg)
(``scale_ipe`` below) — 42 features per scale. The parity default is a single
scale [0, 1), matching the reference, which drops the scaling entirely
(README.md:7); the quality presets use max_deg=5 (210 features). The
view-direction encoder maps (theta, phi) angles through 2^i scales, i in
[min_deg, max_deg) (encoding.py:63-90), 16 features for the default [0, 4).

All ops are batched einsums/elementwise — XLA fuses the projection into the
first MLP matmul's producer chain.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# The exact 21x3 icosahedron-derived constant used by the paper/reference
# (encoding.py:9-30), pinned for parity.
P_BASIS = np.array(
    [
        [0.8506508, 0.0, 0.5257311],
        [0.809017, 0.5, 0.309017],
        [0.5257311, 0.8506508, 0.0],
        [1.0, 0.0, 0.0],
        [0.809017, 0.5, -0.309017],
        [0.8506508, 0.0, -0.5257311],
        [0.309017, 0.809017, -0.5],
        [0.0, 0.5257311, -0.8506508],
        [0.5, 0.309017, -0.809017],
        [0.0, 1.0, 0.0],
        [-0.5257311, 0.8506508, 0.0],
        [-0.309017, 0.809017, -0.5],
        [0.0, 0.5257311, 0.8506508],
        [-0.309017, 0.809017, 0.5],
        [0.309017, 0.809017, 0.5],
        [0.5, 0.309017, 0.809017],
        [0.5, -0.309017, 0.809017],
        [0.0, 0.0, 1.0],
        [-0.5, 0.309017, 0.809017],
        [-0.809017, 0.5, 0.309017],
        [-0.809017, 0.5, -0.309017],
    ],
    dtype=np.float32,
)

POS_ENC_DIM = 2 * P_BASIS.shape[0]  # 42 (per scale)


def pos_enc_dim(min_deg: int = 0, max_deg: int = 1) -> int:
    return POS_ENC_DIM * (max_deg - min_deg)


def scale_ipe(gamma, sigma, min_deg: int, max_deg: int):
    """Expand single-scale IPE phases/attenuations to 2^i frequency scales.

    For basis rows scaled by 2^i: phase -> 2^i * gamma, attenuation
    sigma -> 4^i * sigma. Returns [..., 42*(max_deg-min_deg)] features.
    The reference uses exactly one scale (README.md:7 admits dropping the
    paper's 2^k scaling); min_deg=0, max_deg=1 reproduces that. Higher
    max_deg is the paper-faithful encoding and the main quality lever —
    the reference's own README blames its non-convergence on this family
    of simplifications.
    """
    outs = []
    for i in range(min_deg, max_deg):
        g = gamma * (2.0 ** i)
        attn = jnp.exp(-0.5 * (4.0 ** i) * sigma)
        outs.append(attn * jnp.sin(g))
        outs.append(attn * jnp.cos(g))
    return jnp.concatenate(outs, axis=-1)


def integrated_pos_enc(mean, cov=None, min_deg: int = 0, max_deg: int = 1):
    """IPE features from a (contracted) Gaussian.

    mean: [..., 3]; cov: [..., 3, 3] or None (plain PE).
    Returns [..., 42*(max_deg-min_deg)]:
    exp(-4^i sigma/2) * [sin(2^i P mean), cos(2^i P mean)] over scales i.
    """
    p = jnp.asarray(P_BASIS, dtype=mean.dtype)
    gamma = jnp.einsum("kd,...d->...k", p, mean)
    if cov is None:
        sigma = jnp.zeros_like(gamma)
    else:
        sigma = jnp.einsum("ka,...ab,kb->...k", p, cov, p)
    return scale_ipe(gamma, sigma, min_deg, max_deg)


def viewdir_enc(viewdirs, min_deg: int = 0, max_deg: int = 4):
    """Angular view-direction encoding (reference encoding.py:63-90).

    viewdirs: [..., 3] unit vectors -> [..., 4*(max_deg-min_deg)] features.
    """
    x = viewdirs[..., 0:1]
    y = viewdirs[..., 1:2]
    z = viewdirs[..., 2:3]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    # Reference quirk kept for parity (encoding.py:77): arctan (not arctan2),
    # so azimuth folds into (-pi/2, pi/2) and the +1e-6 shifts the pole. The
    # lone hardening: at x == -1e-6 exactly, y/(x+1e-6) is 0/0 -> NaN for
    # y == 0; substituting a tiny denominator preserves the arctan limit
    # (±pi/2 for y != 0, 0 for y == 0) without changing any other value.
    denom = x + 1e-6
    safe = jnp.where(denom == 0.0, jnp.finfo(viewdirs.dtype).tiny, denom)
    phi = jnp.arctan(y / safe)
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], dtype=viewdirs.dtype)
    theta_s = theta * scales
    phi_s = phi * scales
    return jnp.concatenate(
        [jnp.sin(theta_s), jnp.cos(theta_s), jnp.sin(phi_s), jnp.cos(phi_s)], axis=-1
    )


def viewdir_enc_dim(min_deg: int = 0, max_deg: int = 4) -> int:
    return 4 * (max_deg - min_deg)
