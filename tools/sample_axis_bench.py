"""Measured basis for the sample-axis (CP) composite dispatch policy.

ModelConfig.sample_shards wires parallel/sample_axis.py into render_image;
this tool records WHEN that wins. Three row families:

1. single-chip render throughput vs samples-per-ray N (the real-hardware
   rows): rays/s and the largest chunk that fits, showing where the
   activation footprint starts forcing smaller chunks — the regime sample
   sharding exists for. This environment exposes ONE real chip, so >1-shard
   rows cannot be timed on real hardware (sample_shards needs >= 2 devices);
   the policy conclusion below rests on these rows + arithmetic.
2. virtual-mesh exactness/overhead rows (8 virtual CPU devices,
   JAX_PLATFORMS=cpu): sample_shards in {1, 2, 4} at large N — labeled
   compile-correctness only, NOT a performance signal (CPU timing of a TPU
   collective layout is noise).
3. the arithmetic: per-chunk NeRF activation bytes ~= chunk * N *
   (hidden + input) * itemsize; sample sharding divides the N axis by P at
   the cost of one all_gather([B, P]) + one psum([B, 5]) — a few KB per
   chunk, so it pays as soon as HBM forces the un-sharded chunk below the
   MXU-saturating size (~4096 rays on v5e at the flagship widths).

Usage:
    python tools/sample_axis_bench.py              # single-chip rows (axon)
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/sample_axis_bench.py --virtual

Merges results into SAMPLE_AXIS_BENCH.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "SAMPLE_AXIS_BENCH.json")


def _merge(key, value):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            try:
                data = json.load(f)
            except json.JSONDecodeError:
                data = {}
    data[key] = value
    with open(OUT, "w") as f:
        json.dump(data, f, indent=2)


def _time_render(cfg, n_rays: int, chunk: int) -> float:
    import jax

    from mipnerf360_tpu.core.rays import dummy_rays, rays_to_device
    from mipnerf360_tpu.models.mipnerf360 import init_model, render_image

    params = init_model(jax.random.PRNGKey(0), cfg)
    rays = rays_to_device(dummy_rays(n_rays))

    def run():
        rgb, _, _ = render_image(params, cfg, rays, chunk=chunk)
        return float(jax.device_get(rgb[0, 0]))  # sync barrier

    for _ in range(3):  # >=2 warmups required on the axon runtime
        run()
    t0 = time.perf_counter()
    run()
    return n_rays / (time.perf_counter() - t0)


def single_chip(args):
    from mipnerf360_tpu.config import ModelConfig

    rows = []
    for n in args.samples:
        # keep per-chunk activation footprint comparable: shrink chunk as N
        # grows (the point of the measurement)
        chunk = max(256, args.chunk * 64 // n)
        cfg = ModelConfig(num_samples=n)
        rps = _time_render(cfg, chunk * 4, chunk)
        rows.append({"num_samples": n, "chunk": chunk,
                     "render_rays_per_sec": round(rps, 1),
                     "samples_per_sec": round(rps * n, 1)})
        print(json.dumps(rows[-1]), flush=True)
    _merge("single_chip", {
        "hardware": "TPU v5e, 1 chip (the only real device available)",
        "rows": rows,
        "policy": ("sample_shards=1 is correct whenever the chunk that fits "
                   "HBM still saturates the MXU; the sharded composite's "
                   "collectives cost ~KB per chunk, so it pays only when N "
                   "forces chunk below ~4096 at flagship widths. >1-shard "
                   "rows require >= 2 devices, unavailable here; virtual rows "
                   "cover compile-correctness only."),
    })


def virtual(args):
    import dataclasses

    # Force the virtual CPU mesh BEFORE jax initializes: on this image a
    # sitecustomize pins the axon TPU platform and the JAX_PLATFORMS env var
    # alone does not override it (tests/conftest.py does the same).
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mipnerf360_tpu.config import ModelConfig
    from mipnerf360_tpu.core.rays import dummy_rays, rays_to_device
    from mipnerf360_tpu.models.mipnerf360 import init_model, render_image

    n_dev = len(jax.devices())
    rows = []
    base = ModelConfig(num_samples=args.samples[-1], hidden_proposal=32,
                       hidden_nerf=64, nerf_depth=2, compute_dtype="float32")
    params = init_model(jax.random.PRNGKey(0), base)
    rays = rays_to_device(dummy_rays(128))
    ref = None
    for shards in [1, 2, 4]:
        if n_dev % shards:
            continue
        cfg = dataclasses.replace(base, sample_shards=shards)
        t0 = time.perf_counter()
        out = render_image(params, cfg, rays, chunk=64)
        rgb = np.asarray(out[0])
        dt = time.perf_counter() - t0
        if ref is None:
            ref = rgb
        err = float(np.abs(rgb - ref).max())
        rows.append({"sample_shards": shards, "max_abs_err_vs_1": err,
                     "wall_s_incl_compile": round(dt, 2)})
        print(json.dumps(rows[-1]), flush=True)
        assert err < 1e-4, err
    _merge("virtual_mesh", {
        "what": ("8 virtual CPU devices; EXACTNESS of the reachable "
                 "sample_shards path at N=%d. Timing includes compile and "
                 "is NOT a performance signal." % base.num_samples),
        "rows": rows,
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true")
    ap.add_argument("--samples", type=int, nargs="+",
                    default=[64, 256, 512, 1024])
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()
    if args.virtual:
        virtual(args)
    else:
        single_chip(args)


if __name__ == "__main__":
    main()
