"""Bisect train-step time on the real TPU: time isolated pieces.

Each piece runs K times inside ONE jitted lax.scan program whose carry
perturbs the inputs (so XLA cannot hoist the loop-invariant body) and whose
output is a scalar (so the sync device_get moves 4 bytes, not activations —
over the remote axon tunnel a full-array device_get costs seconds/100MB).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(name, step_fn, K):
    """step_fn: scalar carry -> scalar. Runs K iterations in one program."""

    @jax.jit
    def loop(c0):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, c0, None, length=K)
        return out

    c0 = jnp.zeros((), jnp.float32)
    float(jax.device_get(loop(c0)))  # compile + warm
    t0 = time.perf_counter()
    float(jax.device_get(loop(c0)))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:44s} {dt * 1e3:9.2f} ms/step", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--pallas", default="auto")
    ap.add_argument("--quality", action="store_true",
                    help="profile the quality model (QUALITY_MODEL overrides: "
                         "multi-scale IPE deg 5, input width 226) instead of "
                         "the single-scale parity model")
    args = ap.parse_args()

    from mipnerf360_tpu.config import (QUALITY_MODEL, Config, MeshConfig,
                                       ModelConfig, TrainConfig)
    from mipnerf360_tpu.core.rays import Rays, dummy_rays, rays_map
    from mipnerf360_tpu.models.mipnerf360 import (_encode, init_model,
                                                  nerf_forward, prop_forward)
    from mipnerf360_tpu.models.mlp import apply_mlp
    from mipnerf360_tpu.parallel.mesh import make_mesh, shard_batch_stack, shard_params
    from mipnerf360_tpu.train.state import init_train_state
    from mipnerf360_tpu.train.step import make_train_loop

    model_kw = dict(use_pallas=args.pallas)
    if args.quality:
        model_kw.update(QUALITY_MODEL)
    cfg = Config(model=ModelConfig(**model_kw),
                 train=TrainConfig(batch_size=args.batch, cadence="joint"),
                 mesh=MeshConfig(data=1, model=1))
    mcfg = cfg.model
    params = init_model(jax.random.PRNGKey(0), mcfg)
    rays = rays_map(jnp.asarray, dummy_rays(args.batch))
    key = jax.random.PRNGKey(1)
    B, N, K = args.batch, mcfg.num_samples, args.steps

    def jitter_rays(c):
        return rays._replace(origins=rays.origins + c * 1e-12)

    # 1. pure matmul floor: the nerf trunk shapes on fake activations
    x58 = jnp.ones((B * N, mcfg.input_dim), jnp.bfloat16)
    trunk_acts = ["relu"] * (mcfg.nerf_depth - 1) + (
        ["sigmoid"] if mcfg.trunk_final_sigmoid else ["relu"])

    timed_scan("nerf trunk fwd (matmul floor)", lambda c: jnp.sum(
        apply_mlp(params["nerf"]["trunk"], x58 + c.astype(jnp.bfloat16),
                  trunk_acts, jnp.bfloat16)).astype(jnp.float32), K)

    def trunk_loss(p, c):
        out = apply_mlp(p["nerf"]["trunk"], x58 + c.astype(jnp.bfloat16),
                        trunk_acts, jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32)) * 1e-12

    timed_scan("nerf trunk fwd+bwd", lambda c: jax.grad(
        trunk_loss, argnums=1)(params, c), K)

    # 2. prop forward (sample+encode+mlp+weights)
    timed_scan("prop_forward", lambda c: jnp.sum(
        prop_forward(params, mcfg, jitter_rays(c), key, True)[1]), K)

    # 3. full nerf_forward given fixed prop outputs
    t_prop, w_prop = jax.jit(
        lambda: prop_forward(params, mcfg, rays, key, True))()
    timed_scan("nerf_forward (resample+encode+mlp+comp)", lambda c: jnp.sum(
        nerf_forward(params, mcfg, jitter_rays(c), t_prop, w_prop, key,
                     True)["rgb"]), K)

    # 4. encode only (cast_rays + IPE) at the nerf sample count
    tv = jnp.broadcast_to(jnp.linspace(0.1, 5.0, N + 1), (B, N + 1))
    timed_scan("encode (cast_rays+IPE)", lambda c: jnp.sum(
        _encode(mcfg, jitter_rays(c), tv).astype(jnp.float32)) * 1e-9, K)

    # 4b. losses + resample fwd/bwd at flagship shapes
    from mipnerf360_tpu.core.sampling import resample_along_rays
    from mipnerf360_tpu.losses.distillation import distillation_loss
    from mipnerf360_tpu.losses.distortion import distortion_loss

    kw = jax.random.split(key, 4)
    w_fine = jax.random.uniform(kw[0], (B, N))
    t_fine = jnp.sort(jax.random.uniform(kw[1], (B, N + 1)) * 5 + 0.1, axis=-1)
    w_coarse = jax.random.uniform(kw[2], (B, N))
    t_coarse = jnp.sort(jax.random.uniform(kw[3], (B, N + 1)) * 5 + 0.1, axis=-1)
    sv = jnp.linspace(0, 1, N + 1)[None].repeat(B, 0)

    timed_scan("resample (blur+inv-CDF)", lambda c: jnp.sum(
        resample_along_rays(key, t_coarse + c * 1e-12, w_coarse, True, 0.01)), K)
    timed_scan("distillation loss fwd+bwd", lambda c: jax.grad(
        lambda wc: distillation_loss(t_fine, w_fine, t_coarse, wc + c * 1e-12)
    )(w_coarse).sum(), K)
    timed_scan("distortion loss fwd+bwd", lambda c: jax.grad(
        lambda w: distortion_loss(sv, w + c * 1e-12))(w_fine).sum(), K)

    # 5. full train step (joint cadence) via the production scanned loop
    mesh = make_mesh(1, 1)
    state = init_train_state(jax.random.PRNGKey(0), mcfg, cfg.train)
    state = state._replace(params=shard_params(mesh, state.params))
    loop = make_train_loop(cfg, mesh, donate=False)
    stack = lambda a: np.broadcast_to(np.asarray(a)[None], (K,) + np.asarray(a).shape)
    rays_s, pix_s = shard_batch_stack(
        mesh, rays_map(stack, dummy_rays(B)),
        stack(np.full((B, 3), 0.5, np.float32)))
    _, aux = loop(state, rays_s, pix_s)
    float(jax.device_get(aux["loss"][-1]))
    t0 = time.perf_counter()
    _, aux = loop(state, rays_s, pix_s)
    float(jax.device_get(aux["loss"][-1]))
    dt = (time.perf_counter() - t0) / K
    print(f"{'FULL train step (joint)':44s} {dt * 1e3:9.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
