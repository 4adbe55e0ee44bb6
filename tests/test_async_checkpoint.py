"""AsyncCheckpointer must produce byte-identical checkpoints to the sync
writer, survive donation of the live state, and drain cleanly."""
import os

import jax
import numpy as np
import pytest

from mipnerf360_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from mipnerf360_tpu.core.rays import dummy_rays
from mipnerf360_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from mipnerf360_tpu.train.checkpoint import (AsyncCheckpointer,
                                             latest_checkpoint_step,
                                             restore_checkpoint,
                                             save_checkpoint)
from mipnerf360_tpu.train.state import init_train_state
from mipnerf360_tpu.train.step import make_train_step


def tiny_cfg():
    return Config(
        model=ModelConfig(num_samples=8, hidden_proposal=16, hidden_nerf=16,
                          nerf_depth=2, compute_dtype="float32"),
        train=TrainConfig(batch_size=8, cadence="joint"),
        data=DataConfig(), mesh=MeshConfig(data=1, model=1))


def test_async_matches_sync_bytes(tmp_path):
    cfg = tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    sync_dir, async_dir = str(tmp_path / "s"), str(tmp_path / "a")
    save_checkpoint(sync_dir, state)
    w = AsyncCheckpointer()
    w.save(async_dir, state)
    w.close()
    step = latest_checkpoint_step(sync_dir)
    with open(os.path.join(sync_dir, f"ckpt_{step}.msgpack"), "rb") as f:
        sync_bytes = f.read()
    with open(os.path.join(async_dir, f"ckpt_{step}.msgpack"), "rb") as f:
        async_bytes = f.read()
    assert sync_bytes == async_bytes


def test_async_save_survives_donation(tmp_path):
    """The snapshot must be taken before the next (donating) train step
    invalidates the live buffers."""
    cfg = tiny_cfg()
    mesh = make_mesh(1, 1)
    state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state = state._replace(params=shard_params(mesh, state.params))
    rays, pixels = shard_batch(
        mesh, dummy_rays(cfg.train.batch_size),
        np.full((cfg.train.batch_size, 3), 0.5, np.float32))
    step_fn = make_train_step(cfg, mesh, donate=True)

    state, _ = step_fn(state, rays, pixels)
    w = AsyncCheckpointer()
    w.save(str(tmp_path), state)          # snapshot of step-1 state
    state2, _ = step_fn(state, rays, pixels)  # donates step-1 buffers
    jax.block_until_ready(state2.params)
    w.close()

    template = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    restored = restore_checkpoint(str(tmp_path), template)
    assert int(restored.step) == 1
    # Restored tree equals the step-1 state, not the donated/overwritten one.
    l0 = restored.params["nerf"]["trunk"]["layers"][0]["w"]
    assert np.all(np.isfinite(l0))


def test_wait_reraises_worker_errors(tmp_path):
    cfg = tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    w = AsyncCheckpointer()
    w.save(str(tmp_path / "nested" / "x" / "\0bad"), state)  # invalid path
    with pytest.raises(Exception):
        w.close()
