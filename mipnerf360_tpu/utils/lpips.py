"""LPIPS perceptual metric (VGG-16 backbone), pure-JAX.

The Mip-NeRF 360 paper reports PSNR/SSIM/LPIPS (SURVEY.md §6); the reference
implementation reports none of them beyond PSNR. LPIPS (Zhang et al., CVPR
2018, "The Unreasonable Effectiveness of Deep Features as a Perceptual
Metric") is *defined by* a pretrained backbone: unit-normalized feature maps
from five VGG-16 taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) are
compared with learned per-channel linear calibration weights.

This module implements the complete forward computation in JAX (TPU-jittable,
NHWC). What it cannot ship is the pretrained weights themselves: this build
environment has no network egress and no torchvision/lpips caches (verified —
see tools/export_lpips_weights.py), and random weights would NOT be LPIPS.
So the split is:

- ``lpips(img, ref, weights)`` — the exact metric, given a weights pytree.
- ``load_weights(path)`` — load that pytree from an .npz produced by
  ``tools/export_lpips_weights.py`` (run it anywhere with torchvision +
  the lpips package installed; it writes lpips_vgg.npz).
- ``random_weights(key)`` — He-initialized stand-in used by the unit tests
  to validate shapes/invariances (d(x,x)=0, symmetry, jittability). Scores
  from random weights are labeled "lpips_rand" and are NOT comparable to
  published LPIPS numbers.

apps/eval exposes ``--lpips <weights.npz>``; without a weights file it
prints a one-line notice and reports PSNR/SSIM only.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG-16 "features" layout: conv channel widths per block, with the LPIPS
# feature taps taken after the LAST relu of each block (before maxpool).
_VGG_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))

# Input normalization on [-1, 1]-scaled rgb (Zhang et al.'s ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, kernel, bias):
    """3x3 same-padding NHWC conv + bias."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_features(x, weights: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
    """Five tap activations of VGG-16 for [N, H, W, 3] input in [-1, 1]."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    i = 0
    for b, widths in enumerate(_VGG_BLOCKS):
        for _ in widths:
            x = jax.nn.relu(_conv(x, weights[f"conv{i}_w"],
                                  weights[f"conv{i}_b"]))
            i += 1
        taps.append(x)
        if b < len(_VGG_BLOCKS) - 1:
            x = _maxpool2(x)
    return taps


def _unit_normalize(f, eps: float = 1e-10):
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips(img, ref, weights: Dict[str, jnp.ndarray]):
    """LPIPS distance between [H, W, 3] (or [N, H, W, 3]) images in [0, 1].

    d(x, y) = sum_l mean_hw || w_l ⊙ (f̂_l(x) − f̂_l(y)) ||²  — Zhang et al.
    Eq. (1), with f̂ the unit-normalized tap activations and w_l the learned
    1x1 calibration weights ("lin{l}").
    """
    x = jnp.asarray(img, jnp.float32)
    y = jnp.asarray(ref, jnp.float32)
    if x.ndim == 3:
        x, y = x[None], y[None]
    x = x * 2.0 - 1.0
    y = y * 2.0 - 1.0
    fx = vgg16_features(x, weights)
    fy = vgg16_features(y, weights)
    total = 0.0
    for l, (a, b) in enumerate(zip(fx, fy)):
        diff = _unit_normalize(a) - _unit_normalize(b)
        w = jnp.maximum(weights[f"lin{l}"], 0.0)  # lins are relu-constrained
        total = total + jnp.mean(jnp.sum(w * diff * diff, axis=-1),
                                 axis=(-2, -1))
    return jnp.mean(total)


def load_weights(path: str) -> Dict[str, jnp.ndarray]:
    """Load a weights pytree written by tools/export_lpips_weights.py."""
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def random_weights(key) -> Dict[str, jnp.ndarray]:
    """He-initialized VGG-16 + uniform lins — test/CI stand-in ONLY."""
    weights = {}
    in_c = 3
    i = 0
    for widths in _VGG_BLOCKS:
        for c in widths:
            key, k1 = jax.random.split(key)
            fan_in = 3 * 3 * in_c
            weights[f"conv{i}_w"] = (
                jax.random.normal(k1, (3, 3, in_c, c), jnp.float32)
                * np.sqrt(2.0 / fan_in))
            weights[f"conv{i}_b"] = jnp.zeros((c,), jnp.float32)
            in_c = c
            i += 1
    for l, widths in enumerate(_VGG_BLOCKS):
        weights[f"lin{l}"] = jnp.full((widths[-1],), 1.0 / widths[-1],
                                      jnp.float32)
    return weights
