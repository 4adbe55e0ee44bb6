"""Subtractive A/B: the marginal cost of one piece inside the REAL fused step.

Isolated-piece timing (tools/profile_step.py) over-charges small ops: each
piece pays its own scan-iteration dispatch, while in the fused train step XLA
overlaps VPU work with the matmul chain. This harness measures what a piece
actually costs where it runs: stub it out of the production step and re-time
the same 20-step scanned loop bench.py uses.

    python tools/ab_step.py baseline
    python tools/ab_step.py no_distortion | no_distillation | no_resample | no_blur
    python tools/ab_step.py bounds_einsum|bounds_banded --samples 512 --batch 1024

Round-3 v5e result (PROFILE_r3.json "subtractive_ab_ms_per_step"): every
variant moves the 82 ms step by <1% — the step is matmul-bound, full stop.

The bounds_* variants force one weight_bounds implementation regardless of
the byte-budget dispatch (losses/distillation.py), to measure the actual
einsum<->banded crossover at the large-N shapes the banded form exists for
(VERDICT r3 weak #6: the 512x512 threshold had never been timed at its own
shapes). --samples/--batch size the step accordingly.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", nargs="?", default="baseline")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--k", type=int, default=20, help="scanned steps per call")
    ap.add_argument("--device", choices=["default", "cpu"], default="default",
                    help="cpu: pin the CPU backend (a sitecustomize pins the "
                         "axon TPU platform; env vars alone don't override)")
    args = ap.parse_args()
    variant = args.variant

    import jax
    import jax.numpy as jnp

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import mipnerf360_tpu.core.sampling as samp_mod
    import mipnerf360_tpu.losses.distillation as dill_mod
    import mipnerf360_tpu.losses.distortion as dist_mod
    import mipnerf360_tpu.ops.fused as fused_mod

    if variant == "no_distortion":
        dist_mod.distortion_loss = (
            lambda s, w, reduction="sum", **kw: jnp.sum(w) * 0.0)
    elif variant == "no_distillation":
        # **kw: keyword-only knobs (collapsed=, data_shards=, ...) must not
        # TypeError the stub when the production signature grows (advisor r4)
        dill_mod.distillation_loss = (
            lambda tf, wf, tc, wc, **kw: jnp.sum(wc) * 0.0)
    elif variant == "bounds_einsum":
        dill_mod.weight_bounds = dill_mod.weight_bounds_einsum
    elif variant == "bounds_banded":
        dill_mod.weight_bounds = dill_mod.weight_bounds_banded
    elif variant == "no_resample":
        # **kw absorbs keyword-only knobs (u_typo=...) so the stub cannot
        # drift out of sync with fused.resample_along_rays' signature again
        # (advisor r4: a new u_typo= kwarg made the old 6-arg lambda raise
        # TypeError at trace time).
        fused_mod.resample_along_rays = (
            lambda key, t, w, r, p, mode="auto", **kw: jax.lax.stop_gradient(t))
    elif variant == "no_blur":
        samp_mod.blur_weights = lambda w: w
    elif variant != "baseline":
        raise SystemExit(f"unknown variant {variant!r}")

    # import + reload AFTER the monkeypatch so step.py binds the stubs
    import importlib

    import mipnerf360_tpu.train.step as step_mod
    importlib.reload(step_mod)

    # Guard against silent unstubbing: distillation/distortion are from-imports
    # in step.py (bound at the reload above), resample/blur are call-time
    # module-attribute lookups (ops/fused -> core/sampling). If a future
    # import reorder breaks either wiring, this harness would quietly time the
    # UNSTUBBED step and report a false "<1% marginal cost" — fail loudly
    # instead.
    if variant == "no_distortion":
        assert step_mod.distortion_loss is dist_mod.distortion_loss, \
            "stub not bound: step.py holds a stale distortion_loss"
    elif variant == "no_distillation":
        assert step_mod.distillation_loss is dill_mod.distillation_loss, \
            "stub not bound: step.py holds a stale distillation_loss"
    elif variant == "no_resample":
        import mipnerf360_tpu.models.mipnerf360 as model_mod
        assert model_mod.fused.resample_along_rays is fused_mod.resample_along_rays, \
            "stub not bound: model resolves a different ops.fused module"
    elif variant == "no_blur":
        import mipnerf360_tpu.ops.fused as f2
        assert f2.sampling.blur_weights is samp_mod.blur_weights, \
            "stub not bound: ops.fused resolves a different core.sampling module"
    elif variant.startswith("bounds_"):
        # distillation_loss resolves weight_bounds via its module globals,
        # which the monkeypatch above replaced
        assert dill_mod.weight_bounds is (
            dill_mod.weight_bounds_einsum if variant == "bounds_einsum"
            else dill_mod.weight_bounds_banded), "stub not bound"
        assert step_mod.distillation_loss is dill_mod.distillation_loss, \
            "stub not bound: step.py holds a stale distillation_loss"

    from mipnerf360_tpu.config import (Config, DataConfig, MeshConfig,
                                       ModelConfig, TrainConfig)
    from mipnerf360_tpu.core.rays import dummy_rays, rays_map
    from mipnerf360_tpu.parallel.mesh import (make_mesh, shard_batch_stack,
                                              shard_params)
    from mipnerf360_tpu.train.state import init_train_state

    B, K = args.batch, args.k
    cfg = Config(model=ModelConfig(num_samples=args.samples),
                 train=TrainConfig(batch_size=B, cadence="joint"),
                 data=DataConfig(), mesh=MeshConfig(data=1, model=1))
    mesh = make_mesh(1, 1)
    state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state = state._replace(params=shard_params(mesh, state.params))
    loop = step_mod.make_train_loop(cfg, mesh, donate=True)
    stack = lambda x: np.broadcast_to(np.asarray(x)[None],
                                      (K,) + np.asarray(x).shape)
    rays_s, pix_s = shard_batch_stack(
        mesh, rays_map(stack, dummy_rays(B)),
        stack(np.random.default_rng(0).uniform(0, 1, (B, 3)).astype(np.float32)))
    for _ in range(3):  # >=2 warmups required on the axon runtime (bench.py)
        state, aux = loop(state, rays_s, pix_s)
        float(jax.device_get(aux["loss"][-1]))
    t0 = time.perf_counter()
    state, aux = loop(state, rays_s, pix_s)
    float(jax.device_get(aux["loss"][-1]))
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({"variant": variant, "batch": B,
                      "num_samples": args.samples,
                      "ms_per_step": round(dt * 1e3, 2),
                      "rays_per_sec": round(B / dt, 1)}))


if __name__ == "__main__":
    main()
