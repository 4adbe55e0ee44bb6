"""Unbounded-scene contraction and its analytic Jacobian.

TPU-native counterpart of /root/reference/intern/parameterization.py:23-29
(``contract``) and :64-83 (``gaussian_contract``).

Two deliberate departures from the reference, both verified against the
Mip-NeRF 360 paper (Eq. 10-11):

1. The reference computes ``torch.norm(x)`` over the *whole* [B, N, 3] tensor
   (a single global Frobenius norm), so its per-point contraction never
   actually executes. We apply the paper's per-point contraction.
2. The reference builds the Jacobian with ``torch.autograd.functional.jacobian``
   inside a double Python loop over batch x samples (parameterization.py:77-79,
   hot loop C7 in SURVEY.md). We use the closed form

       contract(x) = x                         if ||x|| <= 1
                     (2 - 1/||x||) * x/||x||   otherwise

       J(x) = alpha * I + beta * x_hat x_hat^T,   n = ||x||, n > 1
       alpha = (2n - 1) / n^2      (tangential scale)
       alpha + beta = 1 / n^2      (radial scale)

   which XLA fuses into the surrounding elementwise code — no loops, no
   autograd traces. Validated against ``jax.jacfwd`` in tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Floor on the norm to keep 1/n finite at the origin (inside the unit ball the
# contraction is the identity anyway, so the clamped values are never selected).
_NORM_EPS = 1e-10


def contract(x):
    """Per-point scene contraction, paper Eq. 10. x: [..., 3] -> [..., 3]."""
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, _NORM_EPS))
    scale = (2.0 - 1.0 / n) / n
    return jnp.where(n2 <= 1.0, x, scale * x)


def contract_jacobian(x):
    """Analytic Jacobian of :func:`contract`. x: [..., 3] -> [..., 3, 3]."""
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, _NORM_EPS))
    xhat = x / n
    alpha = (2.0 * n - 1.0) / (n * n)          # tangential eigenvalue
    radial = 1.0 / (n * n)                     # radial eigenvalue
    beta = radial - alpha
    eye = jnp.eye(3, dtype=x.dtype)
    outer = xhat[..., :, None] * xhat[..., None, :]
    j_out = alpha[..., None] * eye + beta[..., None] * outer
    inside = (n2 <= 1.0)[..., None]
    return jnp.where(inside, eye, j_out)


def contract_gaussian(mean, cov):
    """Push a Gaussian (mean, cov) through the contraction via linearization.

    Sigma' = J Sigma J^T with the analytic J — replaces the reference's
    per-sample autograd loop (parameterization.py:64-83) with one fused
    batched einsum.

    mean: [..., 3], cov: [..., 3, 3] -> (contracted mean, contracted cov).
    """
    j = contract_jacobian(mean)
    new_mean = contract(mean)
    new_cov = jnp.einsum("...ij,...jk,...lk->...il", j, cov, j)
    return new_mean, new_cov
