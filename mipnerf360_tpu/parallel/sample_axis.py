"""Sample-axis (context-parallel) volume rendering across the mesh.

The reference has no analogue (SURVEY.md §2.2: no parallelism of any kind);
this is the framework's CP/SP equivalent. NeRF has no attention — the long
axis is samples-per-ray — and the transmittance cumulative sum
(reference intern/ray.py:178-181) is associative, so it decomposes exactly
across devices:

    T_i = exp(-cumsum_excl(sigma_j * delta_j))
        = exp(-(prefix_of_my_shard + local_cumsum_excl))

Each shard computes its local optical-depth sum, an ``all_gather`` over the
sample axis yields every shard's total, a masked sum gives the exclusive
cross-shard prefix, and the per-ray composite outputs (rgb, acc, distance
numerator) are partial sums combined with one ``psum``. Two collectives per
composite, both riding ICI.

Use when samples-per-ray x batch is too large for one chip's HBM/VMEM (e.g.
full-image render tiles at high sample counts); ray-batch DP remains the
primary axis for training.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _composite_local(density, rgb, t_dists, t_mids, dirs, axis_name):
    """Body run per sample-shard under shard_map. Shapes: density [B, n_loc],
    rgb [B, n_loc, 3], t_dists/t_mids [B, n_loc], dirs [B, 3]."""
    delta = t_dists * jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    density_delta = density * delta  # [B, n_loc]

    # Exclusive prefix of optical depth across shards.
    local_sum = jnp.sum(density_delta, axis=-1)               # [B]
    all_sums = jax.lax.all_gather(local_sum, axis_name, axis=-1)  # [B, P]
    idx = jax.lax.axis_index(axis_name)
    shard_ids = jnp.arange(all_sums.shape[-1])
    prefix = jnp.sum(jnp.where(shard_ids < idx, all_sums, 0.0), axis=-1)  # [B]

    local_excl = jnp.cumsum(density_delta, axis=-1) - density_delta
    trans = jnp.exp(-(prefix[..., None] + local_excl))
    alpha = 1.0 - jnp.exp(-density_delta)
    weights = alpha * trans                                    # [B, n_loc]

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)      # [B, 3]
    acc = jnp.sum(weights, axis=-1)                            # [B]
    dist_num = jnp.sum(weights * t_mids, axis=-1)              # [B]
    partial = jnp.concatenate(
        [comp_rgb, acc[..., None], dist_num[..., None]], axis=-1)
    total = jax.lax.psum(partial, axis_name)                   # [B, 5]
    return total, weights


def make_sample_sharded_composite(mesh: Mesh, axis: str = "model",
                                  white_bkgd: bool = False,
                                  batch_axis: str = None):
    """Build ``fn(rgb, density, t_vals, dirs) -> (rgb, distance, acc, weights)``
    with the sample axis sharded over ``mesh`` axis ``axis``.

    Exact (up to fp reassociation) vs core/rendering.py:volumetric_rendering;
    see tests/test_parallel.py. t_vals: [B, N+1] replicated (edges are tiny);
    rgb [B, N, 3] / density [B, N] sharded on the sample dim; weights come
    back sharded on the sample dim, scalars replicated.

    ``batch_axis`` additionally shards the ray-batch dim over that mesh axis
    (composes sample-axis CP with ray-batch DP — used by render_image when
    ``ModelConfig.sample_shards`` > 1 on a multi-device mesh); the sample-axis
    collectives then run independently per batch shard.
    """
    n_shards = mesh.shape[axis]
    b = batch_axis

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(b, axis, None), P(b, axis), P(b, axis),
                  P(b, axis), P(b, None)),
        out_specs=(P(b, None), P(b, axis)),
        check_vma=False,
    )
    def sharded(rgb, density, t_dists, t_mids, dirs):
        return _composite_local(density, rgb, t_dists, t_mids, dirs, axis)

    def composite(rgb, density, t_vals, dirs):
        assert density.shape[-1] % n_shards == 0, (
            f"sample axis {density.shape[-1]} must divide over {n_shards} "
            f"'{axis}' shards")
        t_dists = t_vals[..., 1:] - t_vals[..., :-1]
        t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
        total, weights = sharded(rgb, density, t_dists, t_mids, dirs)
        comp_rgb, acc, dist_num = total[..., :3], total[..., 3], total[..., 4]
        distance = jnp.clip(
            jnp.nan_to_num(dist_num / acc, nan=0.0),
            t_vals[..., 0], t_vals[..., -1])
        if white_bkgd:
            comp_rgb = comp_rgb + (1.0 - acc[..., None])
        return comp_rgb, distance, acc, weights

    return composite
