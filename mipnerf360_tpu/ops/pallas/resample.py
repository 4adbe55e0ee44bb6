"""Pallas TPU kernel: fused inverse-CDF resampling.

One VMEM-resident pass per ray tile doing what core/sampling.py composes from
several XLA ops (weight blur -> padding -> PDF/CDF -> broadcast interval
search -> lerp; the TPU-native replacement for reference intern/ray.py:12-57
+ 118-153). The interval search is a 2D edge sweep, so nothing larger than a
[TILE, N+1] block ever exists — the jnp path materializes [B, N+1, S] compare
masks (~70 MB per tensor at B=4096) through HBM.

Uniform samples ``u`` are generated outside with ``jax.random`` so PRNG-key
semantics stay identical to the jnp path (the kernel is bit-compatible given
the same ``u``). No backward: resampling is stop-gradient by contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cumsum_lanes

_TILE = 64  # small: the unrolled edge sweep keeps ~4 carries x N+1 slices live in VMEM
_EPS = 1e-5


def _resample_kernel(t_ref, w_ref, u_ref, pad_ref, out_ref):
    t = t_ref[:]                # [TILE, N+1] bin edges
    w = w_ref[:]                # [TILE, N]   raw weights
    u = u_ref[:]                # [TILE, S]   uniform samples in [0, 1)
    resample_padding = pad_ref[0]

    # blur: neighbor max-pool then 0.5-average (ray.py:137-139)
    w_max_l = jnp.maximum(jnp.concatenate([w[:, :1], w[:, :-1]], axis=1), w)
    w_max_r = jnp.maximum(w, jnp.concatenate([w[:, 1:], w[:, -1:]], axis=1))
    w = 0.5 * (w_max_l + w_max_r) + resample_padding

    # PDF/CDF with zero-sum padding (ray.py:15-27)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, _EPS - wsum)
    w = w + padding / w.shape[-1]
    wsum = wsum + padding
    pdf = w / wsum
    cdf = jnp.minimum(1.0, cumsum_lanes(pdf[:, :-1]))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[:, :1]), cdf, jnp.ones_like(cdf[:, :1])], axis=1)

    # Interval search. cdf rows are sorted, so the left edge for sample u is
    # the LAST i with cdf_i <= u and the right edge the FIRST i with cdf_i > u.
    # A fori_loop sweeping i ascending (overwriting the "lower" carries) and
    # descending (overwriting the "upper" carries) finds both with pure 2D
    # [TILE, S] selects — no [TILE, N+1, S] mask tensor is ever materialized
    # (Mosaic cannot lower the 3D masked-reduction gather, and it would cost
    # ~4 MB VMEM per tile anyway).
    # The sweep is statically unrolled (N+1 iterations of 2D selects) because
    # Mosaic lowers neither the 3D masked reduction nor dynamic_slice.
    n_edges = t.shape[-1]
    full = lambda x: jnp.broadcast_to(x, u.shape)
    b0, c0 = full(t[:, :1]), full(cdf[:, :1])
    b1, c1 = full(t[:, -1:]), full(cdf[:, -1:])
    for k in range(n_edges):
        m_lo = u >= cdf[:, k:k + 1]
        b0 = jnp.where(m_lo, t[:, k:k + 1], b0)
        c0 = jnp.where(m_lo, cdf[:, k:k + 1], c0)
        j = n_edges - 1 - k
        m_hi = u < cdf[:, j:j + 1]
        b1 = jnp.where(m_hi, t[:, j:j + 1], b1)
        c1 = jnp.where(m_hi, cdf[:, j:j + 1], c1)
    frac = jnp.clip(jnp.nan_to_num((u - c0) / (c1 - c0), nan=0.0), 0.0, 1.0)
    out_ref[:] = b0 + frac * (b1 - b0)


def resample_tpu(key, t_vals, weights, randomized: bool,
                 resample_padding: float):
    """Drop-in fused replacement for core.sampling.resample_along_rays."""
    b, n = weights.shape
    s = t_vals.shape[-1]
    step = 1.0 / s
    if randomized:
        base = jnp.arange(s, dtype=t_vals.dtype) * step
        noise = jax.random.uniform(
            key, (b, s), dtype=t_vals.dtype, minval=0.0,
            maxval=step - jnp.finfo(jnp.float32).eps)
        u = jnp.minimum(base + noise, 1.0 - jnp.finfo(jnp.float32).eps)
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0 - jnp.finfo(jnp.float32).eps, s,
                         dtype=t_vals.dtype), (b, s))

    b_pad = (-b) % _TILE
    pad = lambda x: jnp.pad(x, ((0, b_pad), (0, 0)))
    grid = (b + b_pad) // _TILE
    out = pl.pallas_call(
        _resample_kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((b + b_pad, s), t_vals.dtype),
        in_specs=[
            pl.BlockSpec((_TILE, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(pad(t_vals), pad(weights), pad(u),
      jnp.asarray([resample_padding], t_vals.dtype))
    return jax.lax.stop_gradient(out[:b])
