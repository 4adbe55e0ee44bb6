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
from .pallas.resample import resample_tpu as _pallas_resample


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
                        resample_padding: float, mode: str = "auto"):
    """Blur + inverse-CDF resampling (core/sampling.py:resample_along_rays).

    The Pallas path is opt-in ("on") rather than "auto": its statically
    unrolled interval sweep makes Mosaic compilation pathologically slow
    (minutes for N=64), while XLA fuses the jnp broadcast-compare formulation
    into the surrounding program well enough that the kernel is not a
    measured win on hardware.
    """
    if mode == "on" and weights.ndim == 2:
        return _pallas_resample(key, t_vals, weights, randomized,
                                resample_padding)
    return sampling.resample_along_rays(key, t_vals, weights, randomized,
                                        resample_padding)
