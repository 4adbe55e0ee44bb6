"""Worker for the FULL-trainer multi-host loopback test (not a pytest module).

Usage: python _multihost_trainer_worker.py <process_id> <num_processes> <port>

The previous multihost workers exercise make_train_step / stage_batch in
isolation; this one runs the REAL ``train/trainer.py::train`` loop end-to-end
under 2 coordinator-connected processes x 2 virtual CPU devices each:
device-bank staging (replicated bank upload + per-process index shards),
the background staging thread, host-0-only metrics/checkpoint writes, and
the final synchronous checkpoint. Asserts:
  1. both processes finish with bit-identical params (grad psum is global),
  2. ONLY process 0 wrote metrics.jsonl / config.json / ckpt files,
  3. the written checkpoint restores to the final in-memory state.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ckpt_dir = sys.argv[4]

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
from mipnerf360_tpu.train.trainer import train  # noqa: E402

n_global = len(jax.devices())
assert jax.process_count() == nproc and n_global == 2 * nproc

cfg = Config(
    model=ModelConfig(num_samples=8, hidden_proposal=16, hidden_nerf=32,
                      nerf_depth=2, compute_dtype="float32", white_bkgd=True),
    train=TrainConfig(max_steps=6, batch_size=8 * n_global, cadence="joint",
                      log_every=3, save_every=0, eval_every=0,
                      eval_image_every=0, lr_delay_steps=2,
                      stage_mode="device_bank", async_staging=True,
                      checkpoint_dir=ckpt_dir),
    data=DataConfig(dataset="synthetic", synthetic_resolution=8,
                    synthetic_views=2),
    mesh=MeshConfig(data=n_global, model=1),
)

state = train(cfg)
assert int(state.step) == 6, int(state.step)

w0 = state.params["nerf"]["trunk"]["layers"][0]["w"]
checksum = float(jax.device_get(jax.numpy.sum(jax.numpy.abs(w0))))
sums = multihost_utils.process_allgather(np.array([checksum], np.float64))
assert np.all(sums == sums.ravel()[0]), sums

# host-0-only writes: the run dir contains metrics/config/ckpt written by
# process 0 only (the parent test asserts file existence; here each process
# checks its own write gating did what it should)
wrote = {f for f in os.listdir(ckpt_dir)} if os.path.isdir(ckpt_dir) else set()
if pid == 0:
    assert "metrics.jsonl" in wrote and "config.json" in wrote, wrote
    assert any(f.startswith("ckpt_") for f in wrote), wrote
    # the final checkpoint restores to the final in-memory state
    from mipnerf360_tpu.train.checkpoint import restore_checkpoint
    from mipnerf360_tpu.train.state import abstract_train_state

    template = abstract_train_state(
        jax.random.PRNGKey(cfg.train.seed), cfg.model, cfg.train)
    restored = restore_checkpoint(ckpt_dir, template)
    assert int(restored.step) == 6
    r0 = np.asarray(restored.params["nerf"]["trunk"]["layers"][0]["w"])
    np.testing.assert_array_equal(r0, np.asarray(jax.device_get(w0)))

print(f"RESULT pid={pid} checksum={checksum}", flush=True)
print(f"OK pid={pid}", flush=True)
