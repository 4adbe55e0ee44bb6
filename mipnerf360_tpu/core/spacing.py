"""Disparity (s-space) spacing transforms for unbounded scenes.

TPU-native, pure-functional counterpart of the reference's
/root/reference/intern/parameterization.py:5-21 (``g``, ``t_to_s``, ``s_to_t``).
Unlike the reference's ``g`` (which mutates its input in place, drifting the
near/far tensors by eps per call — parameterization.py:19), these are pure.
"""
from __future__ import annotations

import jax.numpy as jnp

# Reference uses eps=1e-6 inside g() (parameterization.py:18).
_G_EPS = 1e-6


def g(x):
    """Disparity map g(x) = 1 / (x + eps). Pure (no in-place mutation)."""
    return 1.0 / (x + _G_EPS)


def t_to_s(t_vals, near, far):
    """Map metric distance t to normalized disparity s in [0, 1].

    s = (g(t) - g(near)) / (g(far) - g(near))   [Mip-NeRF 360 Eq. 16 spacing]
    """
    return (g(t_vals) - g(near)) / (g(far) - g(near))


def s_to_t(s_vals, near, far):
    """Inverse of :func:`t_to_s`: t = g⁻¹(s·g(far) + (1-s)·g(near))."""
    return g(s_vals * g(far) + (1.0 - s_vals) * g(near))
