"""Shared in-kernel helpers for the Pallas TPU kernels."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cumsum_lanes(x):
    """Inclusive prefix sum along the last (lane) axis.

    Mosaic has no cumsum lowering; for the small N used here (samples per ray,
    ~64) an [N, N] triangular-ones matmul is exact, lowers cleanly, and runs on
    the MXU: out[..., i] = sum_{j<=i} x[..., j].
    """
    n = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (row <= col).astype(x.dtype)
    # HIGHEST precision: TPU f32 matmuls default to bf16 MXU passes, which
    # costs ~3 decimal digits on the prefix sums; the [N, N] matmul is tiny,
    # so the multi-pass f32 emulation is free in practice.
    return jax.lax.dot_general(
        x, tri, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST)
