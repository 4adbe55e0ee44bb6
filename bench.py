"""Benchmark harness: training-step rays/sec/chip on the flagship config.

Prints ONE JSON line:
    {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
     "vs_baseline": R}

``vs_baseline`` compares against the PyTorch reference's measured training
throughput (BASELINE_MEASURED.json — the reference publishes no numbers, so we
measured its rays/s ourselves; see that file for methodology). Values > 1.0
mean faster than the reference.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def bench_render(args):
    """Deterministic full-image render throughput (model.render_image)."""
    import jax

    from mipnerf360_tpu.config import ModelConfig
    from mipnerf360_tpu.core.rays import dummy_rays, rays_to_device
    from mipnerf360_tpu.models.mipnerf360 import init_model, render_image

    cfg = ModelConfig(use_pallas=args.pallas)  # flagship
    params = init_model(jax.random.PRNGKey(0), cfg)
    n_rays = args.batch * args.steps  # one "image" worth of rays
    rays = rays_to_device(dummy_rays(n_rays))

    def run():
        rgb, dist, acc = render_image(params, cfg, rays, chunk=args.batch)
        return float(jax.device_get(rgb[0, 0]))  # scalar sync barrier

    for _ in range(max(2, args.warmup)):  # >=2: see the train-mode comment
        run()
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(n_rays / dt / len(jax.devices()), 1),
        "unit": "rays/s",
        "vs_baseline": None,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--pallas", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--mode", default="train", choices=["train", "render"],
                    help="render: deterministic render_image throughput "
                         "(the eval/video serving path) instead of training")
    args = ap.parse_args()

    if args.mode == "render":
        return bench_render(args)

    import jax

    from mipnerf360_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
    from mipnerf360_tpu.core.rays import dummy_rays, rays_map
    from mipnerf360_tpu.parallel.mesh import make_mesh, shard_batch_stack, shard_params
    from mipnerf360_tpu.train.state import init_train_state
    from mipnerf360_tpu.train.step import make_train_loop

    n_dev = len(jax.devices())
    cfg = Config(
        model=ModelConfig(remat=args.remat, use_pallas=args.pallas),  # flagship
        train=TrainConfig(batch_size=args.batch, cadence="joint"),
        data=DataConfig(),
        mesh=MeshConfig(data=n_dev, model=1),
    )

    mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
    state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state = state._replace(params=shard_params(mesh, state.params))

    rays_np = dummy_rays(args.batch)
    pixels_np = np.random.default_rng(0).uniform(
        0, 1, (args.batch, 3)).astype(np.float32)

    # K steps fused into one XLA program (lax.scan): one dispatch per
    # measurement, so per-call host/tunnel overhead (seconds over the remote
    # axon tunnel) cannot masquerade as step time in either direction.
    loop_fn = make_train_loop(cfg, mesh, donate=True)
    stack = lambda x: np.broadcast_to(x[None], (args.steps,) + x.shape)
    rays_s, pix_s = shard_batch_stack(
        mesh, rays_map(stack, rays_np), stack(pixels_np))

    # Warmup: full-length calls (same scan length -> one compile). Measured
    # on the axon remote runtime: call 1 compiles, call 2 is ~10x slower than
    # steady state (runtime-internal lazy setup), call 3+ are steady — so at
    # least 2 warmup calls are required for an honest reading.
    # NOTE: a scalar device_get is the sync barrier — on the remote axon
    # platform block_until_ready alone does not guarantee execution finished.
    for _ in range(max(2, args.warmup)):
        state, aux = loop_fn(state, rays_s, pix_s)
        float(jax.device_get(aux["loss"][-1]))

    t0 = time.perf_counter()
    state, aux = loop_fn(state, rays_s, pix_s)
    final_loss = float(jax.device_get(aux["loss"][-1]))
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    rays_per_sec = args.steps * args.batch / dt
    rays_per_sec_per_chip = rays_per_sec / n_dev

    baseline_path = os.path.join(os.path.dirname(__file__) or ".",
                                 "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_rays = ref.get("reference_train_rays_per_sec")
        if ref_rays:
            vs_baseline = rays_per_sec_per_chip / ref_rays

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec_per_chip, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
