"""Distortion regularizer (Mip-NeRF 360 paper Eq. 15).

TPU-native counterpart of /root/reference/intern/regularization.py:3-19, which
implements the pairwise term as an O(N^2) *Python* double loop (4096 scalar
iterations per step at N=64 — hot loop C14 in SURVEY.md). Here:

- :func:`distortion_loss` uses the exact O(N) cumulative form (midpoints are
  sorted ascending, so |m_i - m_j| telescopes into prefix sums) — a handful of
  fused cumsums on the VPU.
- :func:`distortion_loss_quadratic` is the O(N^2) einsum form, kept both as an
  independent oracle for tests and because at N<=128 a single [N,N] einsum can
  ride the MXU.

Both reduce with a *sum* over the ray batch (not a mean) to match the
reference's loss scale (regularization.py:13-17).
"""
from __future__ import annotations

import jax.numpy as jnp


def _midpoints_and_dists(s_vals):
    mids = 0.5 * (s_vals[..., :-1] + s_vals[..., 1:])
    dists = s_vals[..., 1:] - s_vals[..., :-1]
    return mids, dists


def distortion_loss(s_vals, weights, reduction: str = "sum"):
    """Exact O(N) distortion loss.

    s_vals: [..., N+1] (sorted ascending); weights: [..., N].
    reduction "sum": sum over all rays (the reference's scale,
    regularization.py:13-17 — calibrated for its fixed 64-ray batch).
    reduction "mean": per-ray mean — batch-size-invariant, so the weight in
    the total loss keeps the same meaning at any batch size (the photometric
    term 30-PSNR is batch-invariant too; with "sum" the regularizer is
    effectively batch/64 times stronger than the reference's operating point).
    """
    mids, dists = _midpoints_and_dists(s_vals)
    # Exclusive prefix sums over the sample axis.
    cw = jnp.cumsum(weights, axis=-1)
    cwm = jnp.cumsum(weights * mids, axis=-1)
    excl_cw = jnp.concatenate([jnp.zeros_like(cw[..., :1]), cw[..., :-1]], axis=-1)
    excl_cwm = jnp.concatenate([jnp.zeros_like(cwm[..., :1]), cwm[..., :-1]], axis=-1)
    # sum_{i,j} w_i w_j |m_i - m_j| = 2 * sum_i w_i (m_i * CW_{<i} - CWM_{<i})
    pairwise = 2.0 * jnp.sum(weights * (mids * excl_cw - excl_cwm), axis=-1)
    self_term = jnp.sum(weights**2 * dists, axis=-1) / 3.0
    per_ray = pairwise + self_term
    if reduction not in ("mean", "sum"):  # a typo'd override must not
        raise ValueError(                 # silently become 4096x stronger
            f"distortion reduction must be 'mean' or 'sum', got {reduction!r}")
    return jnp.mean(per_ray) if reduction == "mean" else jnp.sum(per_ray)


def distortion_loss_quadratic(s_vals, weights):
    """O(N^2) einsum form — oracle for :func:`distortion_loss`."""
    mids, dists = _midpoints_and_dists(s_vals)
    dm = jnp.abs(mids[..., :, None] - mids[..., None, :])
    pairwise = jnp.einsum("...i,...j,...ij->...", weights, weights, dm)
    self_term = jnp.sum(weights**2 * dists, axis=-1) / 3.0
    return jnp.sum(pairwise + self_term)
