"""The Mip-NeRF 360 model: proposal MLP + NeRF MLP, pure-functional.

TPU-native counterpart of /root/reference/model.py (``prop_net``,
``nerf_net``, ``mipNeRF360``). Differences by design:

- No module objects or mode flags: params are a pytree, randomness is an
  explicit PRNG key, and train/eval stochasticity is the ``randomized``
  argument (the reference toggles it via ``.train()``/``.eval()``,
  model.py:276-283).
- One shared cast/encode/composite path for both levels (the reference
  duplicates the transmittance math, model.py:59-78 vs intern/ray.py:155-191).
- ``render_image`` chunks with an on-device ``lax.map`` over a pre-reshaped
  ray pytree — no host round-trips per chunk (the reference loops on the host
  with per-chunk ``.to(device)``/``.cpu()``, model.py:254-274).

Architecture parity (model.py:43-53, 131-158): the proposal tower ends in a
Sigmoid before its density head, and the NeRF trunk ends in a Sigmoid, with
Sigmoid-activated density/rgb heads. Both quirks are config-gated
(``trunk_final_sigmoid``/``density_head_sigmoid``) so the paper-style variant
is one flag away.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..core.encoding import integrated_pos_enc, viewdir_enc
from ..core.fused_encode import factored_ipe
from ..core.gaussians import cast_rays
from ..core.rays import Rays, rays_map
from ..core.rendering import composite_outputs
from ..core.sampling import sample_along_rays
from ..core.spacing import t_to_s
from ..ops import fused
from .mlp import apply_mlp, init_mlp

Params = Dict[str, Any]


def _compute_dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype)


def init_model(key, cfg: ModelConfig) -> Params:
    kp, kn = jax.random.split(key)
    d = cfg.input_dim
    prop_sizes = [d] + [cfg.hidden_proposal] * cfg.proposal_depth + [1]
    nerf_sizes = [d] + [cfg.hidden_nerf] * cfg.nerf_depth
    kt, kd, kc = jax.random.split(kn, 3)
    params = {
        "prop": init_mlp(kp, prop_sizes),
        "nerf": {
            "trunk": init_mlp(kt, nerf_sizes),
            "density": init_mlp(kd, [cfg.hidden_nerf, 1]),
            "rgb": init_mlp(kc, [cfg.hidden_nerf, 3]),
        },
    }
    if cfg.padded_input_dim != d:
        # Lane alignment (pad_input_lanes): zero rows appended AFTER the
        # real-fan-in Kaiming draw, so init statistics match the unpadded
        # model and the function is preserved up to f32 reduction order
        # (pad features are zero; pad rows get zero grads and stay zero
        # under AdamW).
        pad = cfg.padded_input_dim - d
        for tower in (params["prop"], params["nerf"]["trunk"]):
            w = tower["layers"][0]["w"]
            tower["layers"][0]["w"] = jnp.concatenate(
                [w, jnp.zeros((pad, w.shape[1]), w.dtype)], axis=0)
    return params


def _prop_activations(cfg: ModelConfig):
    final = "sigmoid" if cfg.trunk_final_sigmoid else "relu"
    return ["relu"] * (cfg.proposal_depth - 1) + [final] + ["none"]


def _trunk_activations(cfg: ModelConfig):
    final = "sigmoid" if cfg.trunk_final_sigmoid else "relu"
    return ["relu"] * (cfg.nerf_depth - 1) + [final]


def _encode(cfg: ModelConfig, rays: Rays, t_vals):
    """Cast intervals to contracted Gaussians and build MLP input features."""
    if cfg.factored_encode:
        pos = factored_ipe(t_vals, rays.origins, rays.directions, rays.radii,
                           ray_shape=cfg.ray_shape,
                           min_deg=cfg.ipe_min_deg,
                           max_deg=cfg.ipe_max_deg)     # [B, N, 42*scales]
    else:
        means, covs = cast_rays(t_vals, rays.origins, rays.directions,
                                rays.radii, ray_shape=cfg.ray_shape)
        pos = integrated_pos_enc(means, covs, cfg.ipe_min_deg,
                                 cfg.ipe_max_deg)       # [B, N, 42*scales]
    view = viewdir_enc(rays.viewdirs, cfg.viewdir_min_deg, cfg.viewdir_max_deg)
    view = jnp.broadcast_to(view[..., None, :], pos.shape[:-1] + (view.shape[-1],))
    x = jnp.concatenate([pos, view], axis=-1)
    pad = cfg.padded_input_dim - cfg.input_dim
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
    return x


def prop_forward(params: Params, cfg: ModelConfig, rays: Rays, key,
                 randomized: bool):
    """Proposal level: sample -> encode -> density -> weights (model.py:80-94)."""
    t_vals = sample_along_rays(key, rays.near, rays.far, cfg.num_samples, randomized)
    x = _encode(cfg, rays, t_vals)
    raw = apply_mlp(params["prop"], x, _prop_activations(cfg), _compute_dtype(cfg))
    density = jax.nn.softplus(raw[..., 0] + cfg.density_bias)
    weights = fused.compute_alpha_weights(
        density, t_vals, rays.directions, cfg.use_pallas)
    return t_vals, weights


def nerf_forward(params: Params, cfg: ModelConfig, rays: Rays, t_vals, weights,
                 key, randomized: bool, composite_fn=None):
    """NeRF level: resample -> encode -> trunk -> heads -> composite
    (model.py:163-200).

    ``composite_fn`` (optional) replaces the single-device transmittance +
    composite with a mesh-aware one — the sample-axis (CP) path built by
    parallel/sample_axis.make_sample_sharded_composite, reachable via
    ``ModelConfig.sample_shards`` in render_image. Signature:
    (rgb, density, t_vals, dirs) -> (comp_rgb, distance, acc, weights)."""
    new_t = fused.resample_along_rays(key, t_vals, weights, randomized,
                                      cfg.resample_padding, cfg.use_pallas,
                                      u_typo=cfg.resample_u_typo)
    x = _encode(cfg, rays, new_t)
    dt = _compute_dtype(cfg)

    def tower(nerf_params, x):
        feat = apply_mlp(nerf_params["trunk"], x, _trunk_activations(cfg), dt)
        raw_density = apply_mlp(
            nerf_params["density"], feat,
            ["sigmoid" if cfg.density_head_sigmoid else "none"], dt)
        raw_rgb = apply_mlp(nerf_params["rgb"], feat, ["sigmoid"], dt)
        return raw_density, raw_rgb

    if cfg.remat:
        tower = jax.checkpoint(tower)
    raw_density, raw_rgb = tower(params["nerf"], x)

    rgb = raw_rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
    density = jax.nn.softplus(raw_density[..., 0] + cfg.density_bias)
    if composite_fn is not None:
        comp_rgb, distance, acc, w = composite_fn(
            rgb, density, new_t, rays.directions)
    else:
        w = fused.compute_alpha_weights(
            density, new_t, rays.directions, cfg.use_pallas)
        comp_rgb, distance, acc = composite_outputs(
            rgb, w, new_t, cfg.white_bkgd)
    s_vals = t_to_s(new_t, rays.near, rays.far)
    return {
        "rgb": comp_rgb,
        "distance": distance,
        "acc": acc,
        "t_vals": new_t,
        "weights": w,
        "s_vals": s_vals,
    }


def render_rays(params: Params, cfg: ModelConfig, rays: Rays, key,
                randomized: bool, composite_fn=None):
    """Full two-level forward (model.py:247-252), returning both levels'
    internals for the losses. ``composite_fn`` applies to the NeRF level only
    (the proposal level's weights feed resampling and stay per-device)."""
    k1, k2 = jax.random.split(key)
    t_prop, w_prop = prop_forward(params, cfg, rays, k1, randomized)
    out = nerf_forward(params, cfg, rays, t_prop, w_prop, k2, randomized,
                       composite_fn=composite_fn)
    out["t_prop"] = t_prop
    out["w_prop"] = w_prop
    return out


def render_image(params: Params, cfg: ModelConfig, rays: Rays, *,
                 chunk: int = 8192, key=None, mesh=None):
    """Render a flat [n_rays] batch deterministically, chunked on device.

    Counterpart of model.py:254-274 but with a single jitted ``lax.map`` over
    equal-size chunks (rays padded up to a multiple of ``chunk``).
    With ``mesh``, each chunk's ray axis is sharded over the "data" axis so
    rendering runs data-parallel across the mesh (chunk is rounded up to a
    multiple of the axis size). Returns (rgb [n,3], distance [n], acc [n]).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if cfg.sample_shards > 1:
        # Sample-axis (CP) compositing: the NeRF-level transmittance scan is
        # decomposed over `sample_shards` devices on the mesh "model" axis
        # (parallel/sample_axis.py); remaining devices do ray-batch DP. The
        # use-case is huge samples-per-ray render tiles (SURVEY §2.2); see
        # tools/sample_axis_bench.py for the measured crossover.
        from ..parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        assert n_dev % cfg.sample_shards == 0, (n_dev, cfg.sample_shards)
        if mesh is None or mesh.shape.get("model", 1) != cfg.sample_shards:
            mesh = make_mesh(n_dev // cfg.sample_shards, cfg.sample_shards)
    if mesh is not None:
        n_data = mesh.shape["data"]
        chunk = -(-chunk // n_data) * n_data
    n = rays.origins.shape[0]
    pad = (-n) % chunk
    padded = rays_map(
        lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0)
        if pad else x,
        rays)
    chunked = rays_map(lambda x: x.reshape(-1, chunk, x.shape[-1]), padded)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(None, "data"))
        chunked = rays_map(lambda x: jax.device_put(x, sh), chunked)

    sample_mesh = mesh if cfg.sample_shards > 1 else None
    rgb, distance, acc = _render_map_fn(cfg, sample_mesh)(params, chunked, key)
    return (rgb.reshape(-1, 3)[:n], distance.reshape(-1)[:n], acc.reshape(-1)[:n])


@functools.lru_cache(maxsize=None)  # ModelConfig and Mesh are hashable
def _render_map_fn(cfg: ModelConfig, sample_mesh=None):
    """One jitted program for the whole chunked render. An eager-level
    lax.map re-dispatches per call and measured 10-20x slower than the same
    computation under jit on the remote TPU runtime (173k vs ~15k rays/s).

    ``sample_mesh``: when ModelConfig.sample_shards > 1, the mesh whose
    "model" axis carries the sample-sharded composite."""
    composite_fn = None
    if sample_mesh is not None:
        from ..parallel.sample_axis import make_sample_sharded_composite

        composite_fn = make_sample_sharded_composite(
            sample_mesh, "model", cfg.white_bkgd,
            batch_axis="data" if sample_mesh.shape["data"] > 1 else None)

    @jax.jit
    def fn(params, chunked_rays, key):
        def render_chunk(chunk_rays):
            out = render_rays(params, cfg, chunk_rays, key, randomized=False,
                              composite_fn=composite_fn)
            return out["rgb"], out["distance"], out["acc"]

        return jax.lax.map(render_chunk, chunked_rays)

    return fn
