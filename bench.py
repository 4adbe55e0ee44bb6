"""Benchmark harness: training-step rays/sec/chip.

Default: the single-scale parity model (ModelConfig defaults — the
reference's architecture quirks, input width 58). ``--quality`` benches the
paper-faithful converging model instead (config.py QUALITY_MODEL, multi-scale
IPE, input width 226). ``--staging`` times the end-to-end path including
per-step batch assembly + host->device upload (the default broadcasts one
batch across the scanned steps, excluding fresh-ray HBM traffic).

Prints ONE JSON line:
    {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
     "vs_baseline": R}
(--quality/--staging/--mfu add detail keys: mfu_matmul, config, staging.)

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

    from mipnerf360_tpu.config import QUALITY_MODEL

    model_kw = dict(use_pallas=args.pallas)
    if args.quality:
        model_kw.update(QUALITY_MODEL)
    cfg = ModelConfig(**model_kw)  # flagship
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
    out = {
        "metric": "render_rays_per_sec_per_chip",
        "value": round(n_rays / dt / len(jax.devices()), 1),
        "unit": "rays/s",
        "vs_baseline": None,
    }
    if args.quality:
        out["config"] = "quality (input %d)" % cfg.input_dim
    print(json.dumps(out))


def matmul_flops_per_ray(mcfg) -> float:
    """Analytic matmul FLOPs for ONE ray's forward pass (prop + nerf towers,
    num_samples points each; 2 FLOPs per MAC). Backward adds 2x (dgrad +
    wgrad), so a joint-cadence train step is ~3x this. Encode/resample/
    composite (VPU work) are excluded — this is MFU *of the matmuls*."""
    d_in = mcfg.input_dim
    hp, hn = mcfg.hidden_proposal, mcfg.hidden_nerf
    prop = d_in * hp + (mcfg.proposal_depth - 1) * hp * hp + hp * 1
    nerf = d_in * hn + (mcfg.nerf_depth - 1) * hn * hn + hn * 1 + hn * 3
    return 2.0 * mcfg.num_samples * (prop + nerf)


# TPU v5e (v5 lite) peak bf16 matmul throughput per chip.
PEAK_TFLOPS_BF16 = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--pallas", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--quality", action="store_true",
                    help="bench the converging quality model "
                         "(config.py QUALITY_MODEL: linear density head, "
                         "multi-scale IPE deg 5 -> input width 226) instead "
                         "of the single-scale parity model")
    ap.add_argument("--staging", action="store_true",
                    help="include per-step batch assembly (native sampler "
                         "gather over the synthetic scene) + host->device "
                         "upload in the measured region, mirroring the "
                         "trainer's real path (train/trainer.py stage())")
    ap.add_argument("--mfu", action="store_true",
                    help="add mfu_matmul/config detail keys to the output")
    ap.add_argument("--mode", default="train", choices=["train", "render"],
                    help="render: deterministic render_image throughput "
                         "(the eval/video serving path) instead of training")
    args = ap.parse_args()

    if args.mode == "render":
        return bench_render(args)

    import jax

    from mipnerf360_tpu.config import (QUALITY_MODEL, Config, DataConfig,
                                       MeshConfig, ModelConfig, TrainConfig)
    from mipnerf360_tpu.core.rays import dummy_rays, rays_map
    from mipnerf360_tpu.parallel.mesh import make_mesh, shard_batch_stack, shard_params
    from mipnerf360_tpu.train.state import init_train_state
    from mipnerf360_tpu.train.step import make_train_loop

    n_dev = len(jax.devices())
    model_kw = dict(remat=args.remat, use_pallas=args.pallas)
    if args.quality:
        model_kw.update(QUALITY_MODEL)
    cfg = Config(
        model=ModelConfig(**model_kw),
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

    if args.staging:
        # End-to-end mode: fresh per-step batches assembled by the native
        # sampler over the synthetic scene + host->device upload inside the
        # measured region (the trainer's stage(), train/trainer.py).
        from mipnerf360_tpu.data import get_dataset

        dataset = get_dataset(cfg.data, "train")

        def make_batch(step0: int):
            r, p = dataset.batch_stack(args.steps, args.batch, 0, step0)
            return shard_batch_stack(mesh, r, p)
    else:
        # Default mode: ONE broadcast batch uploaded once, reused every call
        # (compute-only measurement; fresh-ray HBM traffic excluded).
        stack = lambda x: np.broadcast_to(x[None], (args.steps,) + x.shape)
        rays_s, pix_s = shard_batch_stack(
            mesh, rays_map(stack, rays_np), stack(pixels_np))

        def make_batch(step0: int):
            return rays_s, pix_s

    # Warmup: full-length calls (same scan length -> one compile). Measured
    # on the axon remote runtime: call 1 compiles, call 2 is ~10x slower than
    # steady state (runtime-internal lazy setup), call 3+ are steady — so at
    # least 2 warmup calls are required for an honest reading.
    # NOTE: a scalar device_get is the sync barrier — on the remote axon
    # platform block_until_ready alone does not guarantee execution finished.
    for i in range(max(2, args.warmup)):
        state, aux = loop_fn(state, *make_batch(i * args.steps))
        float(jax.device_get(aux["loss"][-1]))

    t0 = time.perf_counter()
    state, aux = loop_fn(state, *make_batch(1000 * args.steps))
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

    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec_per_chip, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    if args.quality or args.staging or args.mfu:
        # 3x forward matmul FLOPs per train step (fwd + dgrad + wgrad).
        tflops = 3.0 * matmul_flops_per_ray(cfg.model) * rays_per_sec_per_chip / 1e12
        out.update({
            "config": ("quality (input %d)" if args.quality
                       else "parity (input %d)") % cfg.model.input_dim,
            "staging": bool(args.staging),
            "matmul_tflops_per_chip": round(tflops, 1),
            "mfu_matmul": round(tflops / PEAK_TFLOPS_BF16, 3),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
