"""Factored frustum->IPE encode: no 3x3 covariance tensors in the hot path.

The general path (gaussians.cast_rays + encoding.integrated_pos_enc, the
counterpart of /root/reference/intern/parameterization.py:31-136 +
encoding.py:33-61) materializes [B, N, 3, 3] covariances and pushes them
through two batched 3x3 einsums plus a 9->21 projection. All of that is
algebraically redundant, because every matrix involved is rank-1-structured:

  lifted cov      Sigma = beta*I + gamma*delta delta^T        (delta = ray dir)
                  beta  = r_var,  gamma = t_var - r_var/||delta||^2
  contraction J   J     = a*I + b*muhat muhat^T               (muhat = mean/n)
                  a = (2n-1)/n^2,  b = 1/n^2 - a   (n>1; J=I inside the ball)

so the IPE attenuation sigma_k = p_k^T (J Sigma J^T) p_k reduces, with
v = Sigma muhat and q = muhat^T Sigma muhat, to

  sigma_k = a^2 (beta + gamma*(P delta)_k^2)
          + 2 a b (beta*(P muhat)_k^2 + gamma*(delta . muhat)*(P muhat)_k*(P delta)_k)
          + b^2 q (P muhat)_k^2

which needs only two projections — P delta ([B, 21], per-ray) and
P mu ([B, N, 21], needed for the sin/cos features anyway) — and a handful of
per-point scalars. Per point this is ~O(21) flops instead of ~O(220), and the
peak live tensor drops from 9 to 1 floats per (point, feature) — a pure win on
both VPU work and HBM traffic, with a matching lean backward.

Numerical equivalence with the general path is enforced by
tests/test_fused_encode.py (atol 1e-5 in f32).
"""
from __future__ import annotations

import jax.numpy as jnp

from .contract import _NORM_EPS
from .encoding import P_BASIS, scale_ipe
from .gaussians import conical_frustum_to_gaussian, cylinder_to_gaussian


def factored_ipe(t_vals, origins, directions, radii, ray_shape: str = "cone",
                 stable: bool = True, min_deg: int = 0, max_deg: int = 1):
    """IPE features straight from ray intervals.
    Returns [..., N, 42*(max_deg-min_deg)].

    Equivalent to
        means, covs = cast_rays(t_vals, origins, directions, radii, ray_shape)
        feats = integrated_pos_enc(means, covs, min_deg, max_deg)
    without forming ``covs`` (or any other [..., 3, 3] tensor).
    """
    t0, t1 = t_vals[..., :-1], t_vals[..., 1:]
    if ray_shape == "cone":
        t_mean, t_var, r_var = conical_frustum_to_gaussian(t0, t1, radii,
                                                           stable=stable)
    elif ray_shape == "cylinder":
        t_mean, t_var, r_var = cylinder_to_gaussian(t0, t1, radii)
    else:
        raise ValueError(f"unknown ray_shape: {ray_shape!r}")

    p = jnp.asarray(P_BASIS, dtype=t_vals.dtype)            # [21, 3]
    d = directions                                           # [..., 3]
    d_mag_sq = jnp.maximum(jnp.sum(d * d, axis=-1, keepdims=True), 1e-10)

    # Sigma = beta*I + gamma * d d^T   (lift_gaussian, diagonalized form)
    beta = r_var                                             # [..., N]
    gamma = t_var - r_var / d_mag_sq                         # [..., N]

    # World-space mean and its projection (the sin/cos phase).
    mu = origins[..., None, :] + d[..., None, :] * t_mean[..., None]  # [...,N,3]
    p_mu = jnp.einsum("kc,...c->...k", p, mu)                # [..., N, 21]
    p_d = jnp.einsum("kc,...c->...k", p, d)[..., None, :]    # [..., 1, 21]

    # Contraction scalars (contract.py closed form). Denominators use the
    # _NORM_EPS-clamped n (NOT raw n2): at mu ~ 0 the unselected outside
    # branch would otherwise compute x/0 = inf and poison the backward pass
    # through the jnp.where (0 * inf = NaN in the grad of the selected
    # branch) — regression-tested in test_fused_encode.py.
    n2 = jnp.sum(mu * mu, axis=-1)                           # [..., N]
    n = jnp.sqrt(jnp.maximum(n2, _NORM_EPS))
    inside = n2 <= 1.0
    a = jnp.where(inside, 1.0, (2.0 * n - 1.0) / (n * n))
    b = jnp.where(inside, 0.0, 1.0 / (n * n) - a)

    # Per-point contracted-covariance scalars.
    d_dot_muhat = jnp.sum(mu * d[..., None, :], axis=-1) / n  # delta . muhat
    q = beta + gamma * d_dot_muhat**2                         # muhat^T Sigma muhat
    p_muhat = p_mu / n[..., None]                             # (P muhat)_k

    sigma = (
        a[..., None] ** 2 * (beta[..., None] + gamma[..., None] * p_d**2)
        + 2.0 * (a * b)[..., None]
        * (beta[..., None] * p_muhat**2
           + (gamma * d_dot_muhat)[..., None] * p_muhat * p_d)
        + (b**2 * q)[..., None] * p_muhat**2
    )                                                         # [..., N, 21]

    # Contracted-mean phase: contract(mu) = scale * mu, so P contract(mu)
    # = scale * P mu (projection is linear).
    scale = jnp.where(inside, 1.0, (2.0 - 1.0 / n) / n)
    gamma_phase = scale[..., None] * p_mu

    return scale_ipe(gamma_phase, sigma, min_deg, max_deg)
