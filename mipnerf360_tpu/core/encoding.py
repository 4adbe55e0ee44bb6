"""Integrated positional encoding (IPE) and view-direction encoding.

TPU-native counterpart of /root/reference/intern/encoding.py.

The position encoder projects contracted means through the fixed 21-row basis
of icosahedral directions from the Mip-NeRF 360 paper (encoding.py:9-30) and
attenuates by exp(-sigma/2) where sigma_k = p_k^T Sigma p_k. Following the
reference (README.md:7), there is no 2^k frequency scaling of P. Output is 42
features per sample. The view-direction encoder maps (theta, phi) angles
through 2^i scales, i in [min_deg, max_deg) (encoding.py:63-90), 16 features
for the default [0, 4).

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

POS_ENC_DIM = 2 * P_BASIS.shape[0]  # 42


def integrated_pos_enc(mean, cov=None):
    """IPE features from a (contracted) Gaussian.

    mean: [..., 3]; cov: [..., 3, 3] or None (plain PE).
    Returns [..., 42]: exp(-sigma/2) * [sin(P mean), cos(P mean)].
    """
    p = jnp.asarray(P_BASIS, dtype=mean.dtype)
    gamma = jnp.einsum("kd,...d->...k", p, mean)
    if cov is None:
        return jnp.concatenate([jnp.sin(gamma), jnp.cos(gamma)], axis=-1)
    sigma = jnp.einsum("ka,...ab,kb->...k", p, cov, p)
    attn = jnp.exp(-0.5 * sigma)
    return jnp.concatenate([attn * jnp.sin(gamma), attn * jnp.cos(gamma)], axis=-1)


def viewdir_enc(viewdirs, min_deg: int = 0, max_deg: int = 4):
    """Angular view-direction encoding (reference encoding.py:63-90).

    viewdirs: [..., 3] unit vectors -> [..., 4*(max_deg-min_deg)] features.
    """
    x = viewdirs[..., 0:1]
    y = viewdirs[..., 1:2]
    z = viewdirs[..., 2:3]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    phi = jnp.arctan(y / (x + 1e-6))
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], dtype=viewdirs.dtype)
    theta_s = theta * scales
    phi_s = phi * scales
    return jnp.concatenate(
        [jnp.sin(theta_s), jnp.cos(theta_s), jnp.sin(phi_s), jnp.cos(phi_s)], axis=-1
    )


def viewdir_enc_dim(min_deg: int = 0, max_deg: int = 4) -> int:
    return 4 * (max_deg - min_deg)
