"""Worker for tools/scaling.py (not a pytest module).

Usage:
  single-process:  python _scaling_worker.py --devices N --batch B --steps K
  multi-process:   python _scaling_worker.py --devices 2 --nproc P --pid I \
                       --port PORT --batch B --steps K
  (each process brings --devices virtual CPU devices; the global mesh is
   nproc * devices wide)

Runs the real scanned train loop (train/step.py:make_train_loop) on a
"data"-sharded mesh and prints one JSON line:
  {"global_devices": G, "steps_per_sec": S, "rays_per_sec": R}
Timing is warmup-then-timed over whole scan chunks (one XLA program per
chunk), wall-clocked around block_until_ready.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("--devices", type=int, default=1)
ap.add_argument("--nproc", type=int, default=1)
ap.add_argument("--pid", type=int, default=0)
ap.add_argument("--port", default="")
ap.add_argument("--batch", type=int, default=2048)
ap.add_argument("--steps", type=int, default=30)
ap.add_argument("--reps", type=int, default=5,
                help="timed repetitions AFTER warmup; per-rep steps/s are "
                     "reported so the caller can compute mean±std")
args = ap.parse_args()

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={args.devices}").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if args.nproc > 1:
    jax.distributed.initialize(f"127.0.0.1:{args.port}",
                               num_processes=args.nproc, process_id=args.pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mipnerf360_tpu.config import (Config, DataConfig, MeshConfig,  # noqa: E402
                                   ModelConfig, TrainConfig)
from mipnerf360_tpu.core.rays import dummy_rays, rays_map  # noqa: E402
from mipnerf360_tpu.parallel.mesh import make_mesh, shard_params  # noqa: E402
from mipnerf360_tpu.train.state import init_train_state  # noqa: E402
from mipnerf360_tpu.train.step import make_train_loop  # noqa: E402

n_global = len(jax.devices())
assert n_global == args.nproc * args.devices, (n_global, args)

cfg = Config(
    model=ModelConfig(num_samples=32, hidden_proposal=64, hidden_nerf=256,
                      nerf_depth=4, compute_dtype="float32"),
    train=TrainConfig(batch_size=args.batch, cadence="joint"),
    data=DataConfig(),
    mesh=MeshConfig(data=n_global, model=1),
)
mesh = make_mesh(n_global, 1)
state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
state = state._replace(params=shard_params(mesh, state.params))

K = args.steps
rng = np.random.default_rng(0)
rays_np = rays_map(lambda x: np.broadcast_to(x[None], (K,) + x.shape).copy(),
                   dummy_rays(args.batch))
pix_np = rng.uniform(0, 1, (K, args.batch, 3)).astype(np.float32)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sh = NamedSharding(mesh, P(None, "data"))
if args.nproc > 1:
    per = args.batch // args.nproc
    sl = slice(args.pid * per, (args.pid + 1) * per)
    put = lambda x: jax.make_array_from_process_local_data(sh, x[:, sl])
else:
    put = lambda x: jax.device_put(x, sh)
rays = rays_map(put, rays_np)
pixels = put(pix_np)

loop_fn = make_train_loop(cfg, mesh, donate=False)
# warmup: compile + one steady-state call
for _ in range(2):
    s, aux = loop_fn(state, rays, pixels)
    jax.block_until_ready(aux["loss"])

per_rep = []
for _ in range(max(1, args.reps)):
    t0 = time.perf_counter()
    s, aux = loop_fn(state, rays, pixels)
    jax.block_until_ready(aux["loss"])
    per_rep.append(K / (time.perf_counter() - t0))

mean = float(np.mean(per_rep))
std = float(np.std(per_rep))
print(json.dumps({
    "global_devices": n_global,
    "steps_per_sec": round(mean, 3),
    "steps_per_sec_std": round(std, 3),
    "steps_per_sec_reps": [round(x, 3) for x in per_rep],
    "rays_per_sec": round(mean * args.batch, 1),
}), flush=True)
