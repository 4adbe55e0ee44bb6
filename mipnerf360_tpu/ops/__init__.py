"""Fused device ops: Pallas TPU kernels with jnp fallbacks.

Selection: ``ops.fused`` mirrors the jnp-composed core functions; callers gate
on ``pallas_available()`` (True on TPU backends) or force the jnp path.
"""
from __future__ import annotations

import jax


def pallas_available() -> bool:
    """Pallas TPU kernels require a TPU-family backend."""
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat in ("tpu", "axon")
