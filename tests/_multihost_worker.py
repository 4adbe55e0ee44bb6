"""Worker process for the multi-host loopback test (not a pytest module).

Usage: python _multihost_worker.py <process_id> <num_processes> <port> [cadence]

Each process brings 2 virtual CPU devices; together they form a global
2*num_processes-device "data" mesh. The worker:
  1. initializes jax.distributed against the loopback coordinator,
  2. builds a global batch from process-LOCAL shards,
  3. runs one jitted data-parallel train step (XLA inserts the grad psum
     across processes),
  4. prints the resulting loss and a cross-process allgather checksum —
     the parent asserts all processes agree bit-exactly.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
cadence = sys.argv[4] if len(sys.argv) > 4 else "joint"

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mipnerf360_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig  # noqa: E402
from mipnerf360_tpu.core.rays import dummy_rays, rays_map  # noqa: E402
from mipnerf360_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params  # noqa: E402
from mipnerf360_tpu.train.state import init_train_state  # noqa: E402
from mipnerf360_tpu.train.step import make_train_step  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
n_global = len(jax.devices())
assert n_global == 2 * nproc, n_global

cfg = Config(
    model=ModelConfig(num_samples=8, hidden_proposal=16, hidden_nerf=32,
                      nerf_depth=2, compute_dtype="float32"),
    train=TrainConfig(batch_size=8 * n_global, cadence=cadence),
    data=DataConfig(),
    mesh=MeshConfig(data=n_global, model=1),
)
mesh = make_mesh(n_global, 1)
state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
state = state._replace(params=shard_params(mesh, state.params))

# Global batch assembled from per-process local shards (each process holds
# only its slice — the multi-host data-feeding pattern).
full_rays = dummy_rays(cfg.train.batch_size)
full_pix = np.linspace(0, 1, cfg.train.batch_size * 3, dtype=np.float32)
full_pix = full_pix.reshape(cfg.train.batch_size, 3)
per = cfg.train.batch_size // nproc
sl = slice(pid * per, (pid + 1) * per)
sh = batch_sharding(mesh)
rays = rays_map(
    lambda x: jax.make_array_from_process_local_data(sh, x[sl]), full_rays)
pixels = jax.make_array_from_process_local_data(sh, full_pix[sl])

step_fn = make_train_step(cfg, mesh, donate=False)
new_state, aux = step_fn(state, rays, pixels)
loss = float(jax.device_get(aux["loss"]))

# Bit-exact agreement across processes (grad psum is global).
losses = multihost_utils.process_allgather(np.array([loss], np.float64))
w0 = new_state.params["nerf"]["trunk"]["layers"][0]["w"]
checksum = float(jax.device_get(jax.numpy.sum(jax.numpy.abs(w0))))
sums = multihost_utils.process_allgather(np.array([checksum], np.float64))

print(f"RESULT pid={pid} loss={losses.ravel().tolist()} "
      f"checksum={sums.ravel().tolist()}", flush=True)
assert np.all(losses == losses.ravel()[0]), losses
assert np.all(sums == sums.ravel()[0]), sums
print(f"OK pid={pid}", flush=True)
