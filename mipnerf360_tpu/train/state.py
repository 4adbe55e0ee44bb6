"""Training state and the AdamW optimizer.

The reference holds state in a torch Module + AdamW + a stateful scheduler
(train.py:24-43). Here state is one pytree — {step, sched_count, params,
opt_state, key} — so a checkpoint is a single tree and exact resume is
trivial (the reference's ``--continue_training`` restarts its step counter
and scheduler at 0; SURVEY.md §5 checkpoint notes).

The optimizer is AdamW built from optax primitives *without* a baked-in
learning rate: updates are scaled by an lr traced through the step function,
so one compiled program serves the whole schedule.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig
from ..models.mipnerf360 import init_model


class TrainState(NamedTuple):
    step: Any          # global step counter
    sched_count: Any   # scheduler counter (3x/step in reference cadence)
    params: Any        # {"prop": ..., "nerf": ...}
    opt_state: Any     # {"prop": ..., "nerf": ...} — same subtree split
    key: Any           # PRNG key consumed by stochastic sampling


def make_optimizer(weight_decay: float) -> optax.GradientTransformation:
    """AdamW sans learning rate: scale_by_adam + decoupled weight decay.

    The caller applies ``params -= lr * updates`` with the scheduled lr.
    Matches the reference's AdamW(lr=sched, wd=1e-5) (train.py:38).
    """
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
    )


def init_train_state(key, model_cfg: ModelConfig, train_cfg: TrainConfig) -> TrainState:
    pkey, skey = jax.random.split(key)
    params = init_model(pkey, model_cfg)
    opt = make_optimizer(train_cfg.weight_decay)
    opt_state = {
        "prop": opt.init(params["prop"]),
        "nerf": opt.init(params["nerf"]),
    }
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        sched_count=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        key=skey,
    )


def abstract_train_state(key, model_cfg: ModelConfig,
                         train_cfg: TrainConfig) -> TrainState:
    """Shape/dtype-only TrainState (no device computation) — the restore
    template for checkpoints. Cheap even over a remote-TPU tunnel."""
    shapes = jax.eval_shape(
        lambda k: init_train_state(k, model_cfg, train_cfg), key)
    import numpy as np

    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def apply_updates_subtree(opt: optax.GradientTransformation, params, grads,
                          opt_state, lr):
    """One AdamW step on a params subtree with a traced learning rate."""
    updates, new_opt_state = opt.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u, params, updates)
    return new_params, new_opt_state
