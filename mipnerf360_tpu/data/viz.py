"""Depth/normal visualization + image conversion helpers (host-side NumPy).

Counterpart of /root/reference/intern/pose.py:112-212 (depth_to_normals,
visualize_depth, visualize_normals, sinebow) and intern/utils.py (to8b,
to_float). matplotlib's turbo colormap is used when available, sinebow as
fallback.
"""
from __future__ import annotations

import numpy as np


def to_float(img: np.ndarray) -> np.ndarray:
    return (np.asarray(img) / 255.0).astype(np.float32)


def to8b(img: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.nan_to_num(img), 0, 1)).astype(np.uint8)


def _convolve2d_same(z, f):
    """Small 'same'-mode 2D convolution (no scipy dependency in the hot path)."""
    fh, fw = f.shape
    ph, pw = fh // 2, fw // 2
    zp = np.pad(z, ((ph, ph), (pw, pw)))
    out = np.zeros_like(z, dtype=np.float64)
    for i in range(fh):
        for j in range(fw):
            out += f[i, j] * zp[i:i + z.shape[0], j:j + z.shape[1]]
    return out


def depth_to_normals(depth):
    """Linearize an orthographic depth map to normals (pose.py:112-120)."""
    f_blur = np.array([1, 2, 1]) / 4.0
    f_edge = np.array([-1, 0, 1]) / 2.0
    dy = _convolve2d_same(depth, f_blur[None, :] * f_edge[:, None])
    dx = _convolve2d_same(depth, f_blur[:, None] * f_edge[None, :])
    inv_denom = 1.0 / np.sqrt(1.0 + dx**2 + dy**2)
    return np.stack([dx * inv_denom, dy * inv_denom, inv_denom], -1)


def sinebow(h):
    f = lambda x: np.sin(np.pi * x) ** 2
    return np.stack([f(3 / 6 - h), f(5 / 6 - h), f(7 / 6 - h)], -1)


def _turbo_or_sinebow():
    try:
        import matplotlib

        turbo = matplotlib.colormaps["turbo"]
        return lambda v: np.asarray(turbo(v))[..., :3]
    except Exception:
        return sinebow


def visualize_normals(depth, acc, scaling=None):
    """Fake-normal visualization of a depth map (pose.py:127-145)."""
    mask = ~np.isnan(depth)
    if scaling is None:
        x, y = np.meshgrid(
            np.arange(depth.shape[1]), np.arange(depth.shape[0]), indexing="xy")
        xy_var = (np.var(x[mask]) + np.var(y[mask])) / 2
        z_var = max(np.var(depth[mask]), 1e-12)
        scaling = np.sqrt(xy_var / z_var)
    normals = depth_to_normals(scaling * depth)
    vis = np.isnan(normals) + np.nan_to_num((normals + 1) / 2, 0)
    if acc is not None:
        vis = vis * acc[:, :, None] + (1 - acc)[:, :, None]
    return vis


def visualize_depth(depth, acc=None, near=None, far=None, ignore_frac=0.0,
                    curve_fn=lambda x: -np.log(x + np.finfo(np.float32).eps),
                    modulus=0, colormap=None):
    """Colormapped depth visualization (pose.py:148-212)."""
    depth = np.asarray(depth)
    if acc is None:
        acc = np.ones_like(depth)
    acc = np.where(np.isnan(depth), np.zeros_like(acc), acc)

    eps = np.finfo(np.float32).eps
    if near is None or far is None:
        # Percentile fallback only when a bound is missing: the argsort +
        # cumulative-accumulation pass is O(HW log HW) per frame and the
        # video path calls this with both bounds given for every frame.
        sortidx = np.argsort(depth.reshape([-1]))
        depth_sorted = depth.reshape([-1])[sortidx]
        acc_sorted = acc.reshape([-1])[sortidx]
        cum_acc = np.cumsum(acc_sorted)
        mask = ((cum_acc >= cum_acc[-1] * ignore_frac) &
                (cum_acc <= cum_acc[-1] * (1 - ignore_frac)))
        depth_keep = depth_sorted[mask]
        near = near if near is not None else depth_keep[0] - eps
        far = far if far is not None else depth_keep[-1] + eps

    depth, near, far = [curve_fn(np.asarray(x, np.float64)) for x in [depth, near, far]]

    if modulus > 0:
        value = np.mod(depth, modulus) / modulus
        colormap = colormap or sinebow
    else:
        value = np.nan_to_num(
            np.clip((depth - np.minimum(near, far)) / np.abs(far - near), 0, 1))
        colormap = colormap or _turbo_or_sinebow()

    vis = colormap(value)[..., :3]
    return vis * acc[:, :, None] + (1 - acc)[:, :, None]
