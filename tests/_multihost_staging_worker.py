"""Worker for the multi-host STAGING parity test (not a pytest module).

Usage: python _multihost_staging_worker.py <process_id> <num_processes> <port>

Asserts that the trainer's per-process staging path (``stage_batch`` when
jax.process_count() > 1: each host gathers only its [K, B/P] shard and the
global [K, B] stack is built via jax.make_array_from_process_local_data) is
BIT-IDENTICAL to the global-assembly path (every host builds the full stack
and device_puts it) — VERDICT r3 item 4's done-criterion. Both paths feed one
jitted scanned train loop; loss trajectory and updated-param checksum must
agree exactly across paths and processes.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

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
from mipnerf360_tpu.data import get_dataset  # noqa: E402
from mipnerf360_tpu.parallel.mesh import make_mesh, shard_batch_stack, shard_params  # noqa: E402
from mipnerf360_tpu.train.state import init_train_state  # noqa: E402
from mipnerf360_tpu.train.step import make_train_loop  # noqa: E402
from mipnerf360_tpu.train.trainer import stage_batch  # noqa: E402

n_global = len(jax.devices())
assert jax.process_count() == nproc and n_global == 2 * nproc

K, B = 3, 8 * n_global
cfg = Config(
    model=ModelConfig(num_samples=8, hidden_proposal=16, hidden_nerf=32,
                      nerf_depth=2, compute_dtype="float32", white_bkgd=True),
    train=TrainConfig(batch_size=B, cadence="joint"),
    data=DataConfig(dataset="synthetic", synthetic_resolution=8,
                    synthetic_views=2),
    mesh=MeshConfig(data=n_global, model=1),
)
mesh = make_mesh(n_global, 1)
dataset = get_dataset(cfg.data, "train")  # deterministic: same on every host


def run(rays, pixels):
    state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state = state._replace(params=shard_params(mesh, state.params))
    loop = make_train_loop(cfg, mesh, donate=False)
    state, aux = loop(state, rays, pixels)
    losses = np.asarray(jax.device_get(aux["loss"]))
    w0 = state.params["nerf"]["trunk"]["layers"][0]["w"]
    checksum = float(jax.device_get(jax.numpy.sum(jax.numpy.abs(w0))))
    return losses, checksum


# Path A — global assembly: every host builds the FULL [K, B, c] stack.
rays_g, pix_g = dataset.batch_stack(K, B, cfg.train.seed, 0)
loss_a, ck_a = run(*shard_batch_stack(mesh, rays_g, pix_g))

# Path B — the trainer's multi-process path (process_count > 1 dispatch).
loss_b, ck_b = run(*stage_batch(mesh, dataset, K, B, cfg.train.seed, 0))

assert np.array_equal(loss_a, loss_b), (loss_a, loss_b)
assert ck_a == ck_b, (ck_a, ck_b)

# Path C — the r5 device-bank path under REAL multi-process collectives:
# the dataset uploaded REPLICATED via make_array_from_process_local_data
# (each process passes the full arrays), per-process index shards gathered
# ON DEVICE inside the scanned loop. Tolerance (not bit-equality) against
# Path A: the banked program's fused gather may reassociate f32 reductions.
from mipnerf360_tpu.parallel.mesh import shard_index_stack_local, upload_bank  # noqa: E402
from mipnerf360_tpu.train.step import make_banked_train_loop  # noqa: E402

bank = upload_bank(mesh, dataset.rays, dataset.pixels)
idx = dataset.index_stack_local(K, B, cfg.train.seed, 0,
                                jax.process_index(), jax.process_count())
idx = shard_index_stack_local(mesh, idx)
state_c = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
state_c = state_c._replace(params=shard_params(mesh, state_c.params))
loop_c = make_banked_train_loop(cfg, mesh, donate=False)
state_c, aux_c = loop_c(state_c, *bank, idx)
loss_c = np.asarray(jax.device_get(aux_c["loss"]))
w0_c = state_c.params["nerf"]["trunk"]["layers"][0]["w"]
ck_c = float(jax.device_get(jax.numpy.sum(jax.numpy.abs(w0_c))))
assert np.allclose(loss_a, loss_c, atol=1e-5), (loss_a, loss_c)
assert abs(ck_a - ck_c) < 1e-3 * max(1.0, abs(ck_a)), (ck_a, ck_c)

# and all processes agree bit-exactly
sums = multihost_utils.process_allgather(
    np.array([ck_b, ck_c], np.float64))
assert np.all(sums == sums[0]), sums
print(f"RESULT pid={pid} loss={loss_b.tolist()} checksum={ck_b}", flush=True)
print(f"OK pid={pid}", flush=True)
