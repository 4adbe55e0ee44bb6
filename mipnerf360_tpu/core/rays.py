"""Ray container used across the framework.

TPU-native counterpart of the reference's ``Rays`` namedtuple
(/root/reference/intern/ray.py:6-10). We register it as a JAX pytree so whole
ray batches flow through ``jit``/``vmap``/``shard_map`` and can be sharded with
``NamedSharding`` without any per-field plumbing.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Rays(NamedTuple):
    """A batch of rays; every field has leading batch dims and a trailing channel dim.

    origins:    [..., 3] ray origins (world or NDC space).
    directions: [..., 3] un-normalized ray directions (pinhole or NDC).
    viewdirs:   [..., 3] unit-norm viewing directions (world space).
    radii:      [..., 1] base radius of the cone/cylinder footprint at unit distance.
    near:       [..., 1] near plane distance.
    far:        [..., 1] far plane distance.
    """

    origins: Any
    directions: Any
    viewdirs: Any
    radii: Any
    near: Any
    far: Any


def rays_map(fn: Callable, rays: Rays) -> Rays:
    """Apply ``fn`` to every field of a ``Rays`` (reference: intern/ray.py:8-10)."""
    return Rays(*(fn(x) for x in rays))


def rays_to_device(rays: Rays, sharding=None) -> Rays:
    """Move a host-side Rays batch onto device(s), optionally with a sharding."""
    if sharding is None:
        return rays_map(jnp.asarray, rays)
    return rays_map(lambda x: jax.device_put(np.asarray(x), sharding), rays)


def flatten_rays(rays: Rays) -> Rays:
    """Flatten all leading dims so each field is [N, channels]."""
    return rays_map(lambda x: x.reshape(-1, x.shape[-1]), rays)


def take_rays(rays: Rays, idx) -> Rays:
    """Gather a subset of rays by integer indices along the leading axis."""
    return rays_map(lambda x: x[idx], rays)


def num_rays(rays: Rays) -> int:
    return rays.origins.shape[0]


def dummy_rays(batch: int, near: float = 2.0, far: float = 6.0, seed: int = 0) -> Rays:
    """Synthetic, well-conditioned ray batch for tests/benches (host-side NumPy)."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(batch, 3)).astype(np.float32)
    viewdirs = d / np.linalg.norm(d, axis=-1, keepdims=True)
    origins = rng.normal(scale=0.1, size=(batch, 3)).astype(np.float32)
    radii = np.full((batch, 1), 0.0005, dtype=np.float32)
    ones = np.ones((batch, 1), dtype=np.float32)
    return Rays(
        origins=origins,
        directions=d,
        viewdirs=viewdirs.astype(np.float32),
        radii=radii,
        near=ones * near,
        far=ones * far,
    )
