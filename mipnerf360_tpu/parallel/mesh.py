"""Device mesh construction and sharding rules.

The reference has zero parallelism (SURVEY.md §2.2); this module is the
framework's scaling layer. Strategy (scaling-book recipe): pick a mesh,
annotate shardings, let XLA insert collectives over ICI/DCN.

Axes:
- "data": ray-batch data parallelism — the primary axis. Batches are sharded
  on their leading dim; params replicated; XLA emits the gradient psum.
- "model": optional tensor parallelism of the 1024-wide NeRF trunk — hidden
  dims sharded Megatron-style (even layers split columns, odd layers split
  rows) so activations alternate sharded/partial and XLA places the matching
  all-reduces on ICI.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.rays import Rays, rays_map


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    # Auto axes: GSPMD propagates shardings and inserts collectives (psum /
    # all-gather) — JAX 0.9 defaults to Explicit, which would require
    # out_sharding annotations on every sharded-contraction matmul.
    return jax.make_mesh(
        (data, model), ("data", "model"),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
        devices=devices[: data * model])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def default_render_mesh() -> Optional[Mesh]:
    """All-data-axis mesh for eval/video rendering, or None on one device
    (the policy shared by apps/eval.py and apps/video.py)."""
    n = len(jax.devices())
    return make_mesh(n, 1) if n > 1 else None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray-batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, rays: Rays, pixels=None):
    """Place a host batch onto the mesh, ray axis split over "data"."""
    sh = batch_sharding(mesh)
    rays = rays_map(lambda x: jax.device_put(np.asarray(x), sh), rays)
    if pixels is None:
        return rays
    return rays, jax.device_put(np.asarray(pixels), sh)


def shard_batch_stack(mesh: Mesh, rays: Rays, pixels=None):
    """Place a [K, B, ...] stack of K per-step batches (for the scanned
    multi-step train loop): the ray axis (dim 1) splits over "data"."""
    sh = NamedSharding(mesh, P(None, "data"))
    rays = rays_map(lambda x: jax.device_put(np.asarray(x), sh), rays)
    if pixels is None:
        return rays
    return rays, jax.device_put(np.asarray(pixels), sh)


def shard_batch_stack_local(mesh: Mesh, rays: Rays, pixels=None):
    """Multi-host counterpart of :func:`shard_batch_stack`: each process
    passes only its [K, B/P, c] shard of the global [K, B, c] stack and the
    global array is assembled from process-local data — no host ever touches
    the full global batch. Local shards must be ordered by process index
    along the batch axis (the layout ``RayDataset.batch_stack_local``
    produces)."""
    sh = NamedSharding(mesh, P(None, "data"))

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    rays = rays_map(put, rays)
    if pixels is None:
        return rays
    return rays, put(pixels)


def upload_bank(mesh: Mesh, rays: Rays, pixels):
    """Upload the full flattened ray/pixel arrays REPLICATED on every device:
    the HBM-resident ray bank for device-side batch gathers (train/step.py
    ``make_banked_train_loop``). Uploaded once per run; per-chunk staging then
    ships only [K, B] int32 indices. Multi-process: every process holds the
    full dataset already (loaders are per-process), so the replicated global
    array is built from identical process-local data."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(x))
    else:
        put = lambda x: jax.device_put(np.asarray(x), sh)
    return rays_map(put, rays), put(pixels)


def shard_index_stack(mesh: Mesh, idx) -> Any:
    """Place a [K, B] int32 index stack with the batch axis over "data"."""
    sh = NamedSharding(mesh, P(None, "data"))
    return jax.device_put(np.asarray(idx), sh)


def shard_index_stack_local(mesh: Mesh, idx) -> Any:
    """Multi-host :func:`shard_index_stack`: each process passes its
    [K, B/P] shard (``RayDataset.index_stack_local`` layout)."""
    sh = NamedSharding(mesh, P(None, "data"))
    return jax.make_array_from_process_local_data(sh, np.asarray(idx))


def param_shardings(mesh: Mesh, params) -> Any:
    """Sharding tree for params: replicated by default; NeRF trunk hidden dims
    sharded over "model" when that axis is >1 (Megatron alternation)."""
    if mesh.shape["model"] == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)

    def shard_tree(tree):
        return jax.tree_util.tree_map(lambda _: replicated(mesh), tree)

    out = {
        "prop": shard_tree(params["prop"]),
        "nerf": {
            "trunk": {"layers": []},
            "density": shard_tree(params["nerf"]["density"]),
            "rgb": shard_tree(params["nerf"]["rgb"]),
        },
    }
    layers = params["nerf"]["trunk"]["layers"]
    for i in range(len(layers)):
        if i % 2 == 0:  # split output features (columns)
            w_spec, b_spec = P(None, "model"), P("model")
        else:           # split input features (rows)
            w_spec, b_spec = P("model", None), P()
        out["nerf"]["trunk"]["layers"].append({
            "w": NamedSharding(mesh, w_spec),
            "b": NamedSharding(mesh, b_spec),
        })
    return out


def shard_params(mesh: Mesh, params):
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)
