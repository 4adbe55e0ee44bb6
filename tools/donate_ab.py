"""A/B: does donate_argnums change per-step time on the axon remote runtime?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mipnerf360_tpu.config import Config, MeshConfig, ModelConfig, TrainConfig
from mipnerf360_tpu.core.rays import dummy_rays, rays_map
from mipnerf360_tpu.parallel.mesh import make_mesh, shard_batch_stack, shard_params
from mipnerf360_tpu.train.state import init_train_state
from mipnerf360_tpu.train.step import make_train_loop

B, K = 4096, 10


def run(donate: bool, pallas: str):
    cfg = Config(model=ModelConfig(use_pallas=pallas),
                 train=TrainConfig(batch_size=B, cadence="joint"),
                 mesh=MeshConfig(data=1, model=1))
    mesh = make_mesh(1, 1)
    state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state = state._replace(params=shard_params(mesh, state.params))
    loop = make_train_loop(cfg, mesh, donate=donate)
    stack = lambda a: np.broadcast_to(np.asarray(a)[None], (K,) + np.asarray(a).shape)
    rays_s, pix_s = shard_batch_stack(
        mesh, rays_map(stack, dummy_rays(B)),
        stack(np.full((B, 3), 0.5, np.float32)))
    state, aux = loop(state, rays_s, pix_s)
    float(jax.device_get(aux["loss"][-1]))
    for trial in range(3):
        t0 = time.perf_counter()
        state, aux = loop(state, rays_s, pix_s)
        float(jax.device_get(aux["loss"][-1]))
        dt = (time.perf_counter() - t0) / K
        print(f"donate={donate} pallas={pallas} trial={trial}: {dt*1e3:8.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    run(donate=False, pallas="auto")
    run(donate=True, pallas="auto")
    run(donate=False, pallas="off")
