"""Proposal-distillation loss (interlevel supervision).

TPU-native counterpart of /root/reference/intern/distillation.py. The
reference computes the overlap bound with a Python loop whose boolean-mask
indexing collapses the batch dimension (each bound becomes a batch-global
scalar — verified quirk, SURVEY.md C13). Here the bound is computed *per ray*
— the intended semantics — via a banded prefix-sum + binary-search form
(sorted grids make each overlap run contiguous), with the broadcast
overlap-mask einsum kept as the independent oracle (weight_bounds_einsum).

Direction follows the reference (README.md:7, distillation.py:4-8): the bound
is computed FROM the NeRF level's weights, and the hinge penalizes proposal
weights that fall below that envelope. The bound carries no gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_bounds_einsum(t_fine, w_fine, t_coarse, data_shards: int = 1):
    """O(Nc*Nf) overlap-mask oracle for ``weight_bounds``. ``data_shards``
    is ignored — accepted so the forced variants (tools/ab_step.py) stay
    call-compatible with the dispatching ``weight_bounds``.

    Materializes the full [..., Nc, Nf] overlap tensor (64 MiB of bool at
    B=4096, N=64 — the largest transient in the step, growing quadratically
    in N). Kept as the independent oracle for the banded production path.
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


def _searchsorted(a, v, side: str):
    """Batched searchsorted: a [..., Na] (each row sorted), v [..., Nv]."""
    a2 = a.reshape(-1, a.shape[-1])
    v2 = v.reshape(-1, v.shape[-1])
    out = jax.vmap(lambda aa, vv: jnp.searchsorted(aa, vv, side=side))(a2, v2)
    return out.reshape(v.shape)


def weight_bounds_banded(t_fine, w_fine, t_coarse, data_shards: int = 1):
    """For each coarse interval, sum the fine weights of overlapping intervals.

    t_fine: [..., Nf+1]; w_fine: [..., Nf]; t_coarse: [..., Nc+1].
    Returns bounds [..., Nc] (stop-gradient applied). ``data_shards`` is
    ignored (call-compatibility with the dispatching ``weight_bounds``).

    Both grids are sorted per ray, so the fine intervals overlapping a coarse
    interval form a contiguous run: with prefix sums S of w_fine,
    bound_i = S[jhi_i] - S[jlo_i] where jlo_i is the first fine interval whose
    upper edge reaches lo_i and jhi_i counts those whose lower edge is at most
    hi_i (touching counts, matching the oracle's ``~(> | <)`` mask). Two
    binary searches per coarse edge — O(Nc log Nf), no [.., Nc, Nf] tensor.

    NOT the TPU production path at flagship shapes: the binary searches and
    prefix gathers are serial VPU work, and making this the default measured
    50,053 -> 34,596 rays/s/chip (-31%) on v5e at B=4096, N=64, where the
    einsum's [B, Nc, Nf] tensor is 33 MFLOP of MXU time and a 64 MiB
    transient — both noise. r4 measured the large-N regime too: the einsum
    stays 1.7-1.8x faster through 1-2 GiB transients (see the threshold
    comment below), so ``weight_bounds`` dispatches here only when the
    quadratic transient would actually threaten HBM capacity.
    """
    t0 = t_fine[..., :-1]   # [..., Nf] (sorted)
    t1 = t_fine[..., 1:]    # [..., Nf] (sorted)
    lo = t_coarse[..., :-1]  # [..., Nc]
    hi = t_coarse[..., 1:]
    prefix = jnp.concatenate(
        [jnp.zeros_like(w_fine[..., :1]), jnp.cumsum(w_fine, axis=-1)], -1)
    jlo = _searchsorted(t1, lo, side="left")    # first j with t1[j] >= lo_i
    jhi = _searchsorted(t0, hi, side="right")   # count of j with t0[j] <= hi_i
    jhi = jnp.maximum(jhi, jlo)                 # empty run -> bound 0
    bounds = (jnp.take_along_axis(prefix, jhi, axis=-1)
              - jnp.take_along_axis(prefix, jlo, axis=-1))
    return jax.lax.stop_gradient(bounds)


# Above this many bytes of [.., Nc, Nf] einsum transient, the quadratic
# overlap tensor starts to threaten HBM and the banded form takes over. The
# budget counts the full transient — batch dims INCLUDED — because that is
# what actually lands in HBM: at B=4096, Nc=Nf=512 the f32 overlap operand
# alone is ~4 GiB, far past any per-ray-pair threshold (advisor r3).
#
# The crossover is HBM capacity, NOT speed: measured on v5e (tools/ab_step.py
# bounds_* variants, r4) the einsum step is FASTER than banded all the way up
# to the largest transients that safely fit —
#   B=1024, N=512  (1 GiB transient): einsum 164.6 ms/step, banded 282.4
#   B=512,  N=1024 (2 GiB transient): einsum 166.0 ms/step, banded 294.8
# so the threshold sits at the measured-safe 2 GiB (16 GB HBM chip) and the
# banded form exists purely as the beyond-HBM fallback. Static shapes ->
# free dispatch.
_BANDED_BYTES_THRESHOLD = 2 * 1024 * 1024 * 1024


def _einsum_transient_bytes(w_fine, nc: int, data_shards: int = 1) -> int:
    """PER-DEVICE bytes of the [.., Nc, Nf] overlap transient.

    Under data-parallel GSPMD the batch axis is sharded over ``data_shards``
    devices, so each device materializes only batch/data_shards of the
    transient (advisor r4: budgeting the GLOBAL shape fell back to banded up
    to n_devices x too early — e.g. global B=4096, N=512 on 8 chips is
    0.5 GiB/chip, not 4 GiB)."""
    import math

    batch = math.prod(w_fine.shape[:-1])
    itemsize = jnp.dtype(w_fine.dtype).itemsize
    return batch * nc * w_fine.shape[-1] * itemsize // max(1, data_shards)


def weight_bounds(t_fine, w_fine, t_coarse, data_shards: int = 1):
    """Production bound: einsum at flagship shapes, banded when the quadratic
    overlap transient would exceed the per-device HBM byte budget
    (``data_shards`` = size of the mesh "data" axis the batch is sharded
    over; the train step plumbs it in).

    Same contract as ``weight_bounds_banded`` (the two agree exactly; see
    tests/test_losses.py).
    """
    nc = t_coarse.shape[-1] - 1
    if _einsum_transient_bytes(w_fine, nc, data_shards) > _BANDED_BYTES_THRESHOLD:
        return weight_bounds_banded(t_fine, w_fine, t_coarse)
    return weight_bounds_einsum(t_fine, w_fine, t_coarse)


def proposal_loss(w_coarse, bounds, eps: float = 1e-6):
    """Hinge loss sum(relu(bound - w)^2 / (w + eps)) / batch (distillation.py:35-51)."""
    batch = bounds.shape[0]
    hinge = jnp.maximum(bounds - w_coarse, 0.0)
    return jnp.sum(hinge**2 / (w_coarse + eps)) / batch


def distillation_loss(t_fine, w_fine, t_coarse, w_coarse,
                      collapsed: bool = False, data_shards: int = 1):
    """bounds + hinge in one call (loss facade, reference loss.py:6-21).

    ``collapsed=True`` reproduces the reference's batch-collapse quirk
    (distillation.py:27-29): its boolean-mask indexing flattens batch+sample
    dims, so each bound is the SUM of every ray's per-ray bound, broadcast
    back to all rays. Kept for quirk-exact parity ablations; default is the
    intended per-ray bound. ``data_shards`` sizes the per-device einsum
    transient for the weight_bounds dispatch (see there)."""
    b = weight_bounds(t_fine, w_fine, t_coarse, data_shards)
    if collapsed:
        b = jnp.sum(b, axis=0, keepdims=True)
    return proposal_loss(w_coarse, jnp.broadcast_to(b, w_coarse.shape))
