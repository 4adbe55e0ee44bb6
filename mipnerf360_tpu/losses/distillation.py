"""Proposal-distillation loss (interlevel supervision).

TPU-native counterpart of /root/reference/intern/distillation.py. The
reference computes the overlap bound with a Python loop whose boolean-mask
indexing collapses the batch dimension (each bound becomes a batch-global
scalar — verified quirk, SURVEY.md C13). Here the bound is computed *per ray*
with one broadcast overlap mask and an einsum, which is both the intended
semantics and a single fused device op.

Direction follows the reference (README.md:7, distillation.py:4-8): the bound
is computed FROM the NeRF level's weights, and the hinge penalizes proposal
weights that fall below that envelope. The bound carries no gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_bounds(t_fine, w_fine, t_coarse):
    """For each coarse interval, sum the fine weights of overlapping intervals.

    t_fine: [..., Nf+1]; w_fine: [..., Nf]; t_coarse: [..., Nc+1].
    Returns bounds [..., Nc] (stop-gradient applied).
    """
    t0 = t_fine[..., :-1]   # [..., Nf]
    t1 = t_fine[..., 1:]
    lo = t_coarse[..., :-1]  # [..., Nc]
    hi = t_coarse[..., 1:]
    # overlap[..., i, j] = fine interval j intersects coarse interval i
    overlap = ~((t0[..., None, :] > hi[..., :, None]) |
                (t1[..., None, :] < lo[..., :, None]))
    bounds = jnp.einsum("...ij,...j->...i", overlap.astype(w_fine.dtype), w_fine)
    return jax.lax.stop_gradient(bounds)


def proposal_loss(w_coarse, bounds, eps: float = 1e-6):
    """Hinge loss sum(relu(bound - w)^2 / (w + eps)) / batch (distillation.py:35-51)."""
    batch = bounds.shape[0]
    hinge = jnp.maximum(bounds - w_coarse, 0.0)
    return jnp.sum(hinge**2 / (w_coarse + eps)) / batch


def distillation_loss(t_fine, w_fine, t_coarse, w_coarse):
    """bounds + hinge in one call (loss facade, reference loss.py:6-21)."""
    b = weight_bounds(t_fine, w_fine, t_coarse)
    return proposal_loss(w_coarse, b)
