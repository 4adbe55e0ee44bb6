"""Dispatch between Pallas TPU kernels and the jnp-composed core functions.

Callers pass the ``use_pallas`` mode from :class:`ModelConfig`:
``"auto"`` picks the Pallas path on TPU backends, ``"on"`` forces it
(interpret mode still works on CPU for tests), ``"off"`` always uses the
jnp path. Both paths are numerically equivalent (see tests/test_pallas_ops.py).
"""
from __future__ import annotations

import jax

from ..core import rendering, sampling
from . import pallas_available
from .pallas.composite import composite_weights as _pallas_composite


def _use(mode: str) -> bool:
    if mode == "on":
        return True
    if mode == "off":
        return False
    assert mode == "auto", mode
    return pallas_available()


def compute_alpha_weights(density, t_vals, dirs, mode: str = "auto"):
    """Density -> compositing weights (core/rendering.py:compute_alpha_weights).

    Returns weights only; rays needing the transmittance too must use the core
    function (nothing in the model does outside of tests).
    """
    if _use(mode) and density.ndim == 2:
        return _pallas_composite(density, t_vals, dirs)
    w, _ = rendering.compute_alpha_weights(density, t_vals, dirs)
    return w


def resample_along_rays(key, t_vals, weights, randomized: bool,
                        resample_padding: float, mode: str = "auto",
                        u_typo: bool = False):
    """Blur + inverse-CDF resampling (core/sampling.py:resample_along_rays).

    Always the jnp path — there is deliberately NO Pallas kernel here. A
    round-1 kernel (statically unrolled interval sweep) compiled in minutes
    under Mosaic and was never a measured win; the arithmetic says it cannot
    be: at the flagship shape (B=4096, N=64) resampling moves ~0.2 MB/ray-
    batch of useful data vs the nerf MLP's ~2.7 GFLOP — well under 1% of the
    step on either the FLOP or the bandwidth roofline, and XLA already fuses
    the broadcast-compare interval search into the surrounding program. The
    ``mode`` arg is kept so call sites stay uniform with
    compute_alpha_weights (the kernel that IS a win).
    """
    del mode
    return sampling.resample_along_rays(key, t_vals, weights, randomized,
                                        resample_padding, u_typo=u_typo)
