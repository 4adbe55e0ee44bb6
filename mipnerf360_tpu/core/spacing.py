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

    Mathematically s = (g(t) - g(near)) / (g(far) - g(near)) [Mip-NeRF 360
    Eq. 16 spacing], but that form cancels catastrophically in f32 when
    ``far - near`` is small relative to ``near`` (both numerator and
    denominator are differences of nearly-equal reciprocals). With
    a = t+eps, n = near+eps, f = far+eps the ratio rewrites exactly as

        s = ((near - t) * f) / ((near - far) * a)

    where the subtractions are between *original* magnitudes (Sterbenz-safe),
    so the round trip with :func:`s_to_t` is accurate to a few ulp even for
    narrow [near, far] intervals.
    """
    a = t_vals + _G_EPS
    f = far + _G_EPS
    return ((near - t_vals) * f) / ((near - far) * a)


def s_to_t(s_vals, near, far):
    """Inverse of :func:`t_to_s`: t = g⁻¹(s·g(far) + (1-s)·g(near)).

    Uses the exact inverse g⁻¹(y) = 1/y − eps (the reference composes ``g``
    with itself, applying eps twice — parameterization.py:11-13 — which
    biases t by ~eps·t² and breaks the round trip). Evaluated in the
    cancellation-free form

        t = (f·n) / (s·n + (1−s)·f) − eps,   n = near+eps, f = far+eps

    which hits the endpoints exactly: s=0 → near, s=1 → far.
    """
    n = near + _G_EPS
    f = far + _G_EPS
    return (f * n) / (s_vals * n + (1.0 - s_vals) * f) - _G_EPS
