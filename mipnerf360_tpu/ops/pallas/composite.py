"""Pallas TPU kernel: fused density -> compositing-weights transmittance scan.

Computes, per ray, in one VMEM-resident pass (cf. core/rendering.py
``compute_alpha_weights``, the TPU-native replacement for reference
intern/ray.py:171-182 and model.py:59-78):

    delta_i = (t_{i+1} - t_i) * ||dir||
    dd_i    = density_i * delta_i
    T_i     = exp(-sum_{j<i} dd_j)
    w_i     = (1 - exp(-dd_i)) * T_i

Backward is a custom VJP with the exact reverse-suffix-sum form,

    dL/ddd_j = g_j * exp(-dd_j) * T_j - sum_{i>j} g_i * w_i,

also as a Pallas kernel. Cotangents flow to ``density`` only: in this
framework every ``t_vals`` entering the composite is either stop-gradient
(resampled, core/sampling.py) or a pure function of ray data, and ``dirs``
are data — so their zero cotangents are exact, not an approximation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cumsum_lanes

_TILE = 256  # rays per grid step


def _one_minus_exp_neg(dd):
    """Accurate 1 - exp(-dd) for dd >= 0 (Mosaic has no expm1 primitive).

    1-exp underflows to exactly 0 at dd ~ 3e-8 (see core/rendering.py note);
    below the switch point a 3-term Taylor series is f32-exact and keeps the
    value (and the gradient path through it) alive down to denormals.
    """
    taylor = dd * (1.0 - dd * 0.5 * (1.0 - dd * (1.0 / 3.0)))
    return jnp.where(dd < 1e-2, taylor, 1.0 - jnp.exp(-dd))


def _fwd_kernel(density_ref, t_ref, dnorm_ref, w_ref, trans_ref):
    density = density_ref[:]                       # [TILE, N]
    t = t_ref[:]                                   # [TILE, N+1]
    dnorm = dnorm_ref[:]                           # [TILE, 1]
    delta = (t[:, 1:] - t[:, :-1]) * dnorm
    dd = density * delta
    csum = cumsum_lanes(dd)
    trans = jnp.exp(-(csum - dd))                  # exclusive prefix: T_i
    alpha = _one_minus_exp_neg(dd)
    w_ref[:] = alpha * trans
    trans_ref[:] = trans


def _bwd_kernel(density_ref, t_ref, dnorm_ref, g_ref, out_ref):
    density = density_ref[:]
    t = t_ref[:]
    dnorm = dnorm_ref[:]
    g = g_ref[:]
    delta = (t[:, 1:] - t[:, :-1]) * dnorm
    dd = density * delta
    csum = cumsum_lanes(dd)
    trans = jnp.exp(-(csum - dd))
    alpha = _one_minus_exp_neg(dd)
    w = alpha * trans
    gw = g * w
    # suffix sum over i > j: total - inclusive prefix
    suffix = jnp.sum(gw, axis=-1, keepdims=True) - cumsum_lanes(gw)
    d_dd = g * jnp.exp(-dd) * trans - suffix
    out_ref[:] = d_dd * delta


def _specs(n, np1):
    return dict(
        in_specs=[
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, np1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )


def _pad(x, b_pad):
    return jnp.pad(x, ((0, b_pad),) + ((0, 0),) * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def composite_weights(density, t_vals, dirs):
    w, _ = _composite_fwd_impl(density, t_vals, dirs)
    return w


def _norm(dirs):
    return jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def _composite_fwd_impl(density, t_vals, dirs):
    b, n = density.shape
    b_pad = (-b) % _TILE
    grid = (b + b_pad) // _TILE
    dnorm = _norm(dirs)
    args = (_pad(density, b_pad), _pad(t_vals, b_pad), _pad(dnorm, b_pad))
    w, trans = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((b + b_pad, n), density.dtype),
            jax.ShapeDtypeStruct((b + b_pad, n), density.dtype),
        ),
        out_specs=(
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        **_specs(n, n + 1),
    )(*args)
    return w[:b], trans[:b]


def _composite_vjp_fwd(density, t_vals, dirs):
    w, _ = _composite_fwd_impl(density, t_vals, dirs)
    return w, (density, t_vals, dirs)


def _composite_vjp_bwd(res, g):
    density, t_vals, dirs = res
    b, n = density.shape
    b_pad = (-b) % _TILE
    grid = (b + b_pad) // _TILE
    dnorm = _norm(dirs)
    d_density = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((b + b_pad, n), density.dtype),
        out_specs=pl.BlockSpec((_TILE, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        in_specs=_specs(n, n + 1)["in_specs"] + [
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )(_pad(density, b_pad), _pad(t_vals, b_pad), _pad(dnorm, b_pad),
      _pad(g, b_pad))[:b]
    return d_density, jnp.zeros_like(t_vals), jnp.zeros_like(dirs)


composite_weights.defvjp(_composite_vjp_fwd, _composite_vjp_bwd)
