"""The fused, jitted train step — both update cadences.

Counterpart of the reference's hot loop (train.py:51-88): per global step,
2 inner proposal updates then 1 NeRF+distortion update, scheduler stepped 3x.
The whole cadence compiles into ONE XLA program; with a sharded ray batch and
replicated params, XLA inserts the gradient all-reduce (psum over the "data"
mesh axis) automatically.

Cadences:
- "reference": faithful 2+1 update structure (train.py:53-82). One deliberate
  divergence: the reference's single AdamW covers ALL params on every
  optimizer.step(), so frozen subtrees receive stale-moment + weight-decay
  updates from zero grads; we update only the subtree whose loss was computed
  (the intended semantics).
- "joint" (default): one fused update — photometric + distortion into the NeRF
  subtree, distillation into the proposal subtree, one forward pass of each
  level per step. ~3x fewer matmuls per step at equal iteration count.

Loss split (matching reference train.py):
  prop phase:  L_prop(stop_grad(nerf t,w) -> bounds, prop w)     [loss.py:6]
  nerf phase:  (30 - PSNR) + 0.01 * distortion                   [train.py:75-77]
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax

from ..config import Config
from ..core.rays import Rays
from ..losses.distillation import distillation_loss
from ..losses.distortion import distortion_loss
from ..losses.photometric import photometric_loss
from ..models.mipnerf360 import nerf_forward, prop_forward
from .schedule import log_lerp_lr
from .state import TrainState, apply_updates_subtree, make_optimizer


def _lr(train_cfg, count):
    horizon = train_cfg.lr_max_steps or train_cfg.max_steps
    return log_lerp_lr(
        count, train_cfg.lr_init, train_cfg.lr_final, horizon,
        train_cfg.lr_delay_steps, train_cfg.lr_delay_mult)


def _forward_both(params, model_cfg, rays, key, randomized):
    k1, k2 = jax.random.split(key)
    t_prop, w_prop = prop_forward(params, model_cfg, rays, k1, randomized)
    out = nerf_forward(params, model_cfg, rays, t_prop, w_prop, k2, randomized)
    return t_prop, w_prop, out


def _prop_phase(params, opt, opt_state, model_cfg, train_cfg, rays, key,
                sched_count, randomized, data_shards=1):
    """One proposal-distillation update (reference train.py:53-65)."""

    def loss_fn(prop_params):
        p = {"prop": prop_params, "nerf": params["nerf"]}
        t_prop, w_prop, out = _forward_both(p, model_cfg, rays, key, randomized)
        t = jax.lax.stop_gradient(out["t_vals"])
        w = jax.lax.stop_gradient(out["weights"])
        return distillation_loss(t, w, t_prop, w_prop,
                                 collapsed=train_cfg.quirk_collapsed_bounds,
                                 data_shards=data_shards)

    loss, grads = jax.value_and_grad(loss_fn)(params["prop"])
    lr = _lr(train_cfg, sched_count)
    new_prop, new_opt = apply_updates_subtree(
        opt, params["prop"], grads, opt_state["prop"], lr)
    params = {"prop": new_prop, "nerf": params["nerf"]}
    opt_state = {"prop": new_opt, "nerf": opt_state["nerf"]}
    return params, opt_state, loss


def _nerf_phase(params, opt, opt_state, model_cfg, train_cfg, rays, pixels,
                key, sched_count, randomized):
    """One photometric+distortion update (reference train.py:68-82)."""

    def loss_fn(nerf_params):
        p = {"prop": params["prop"], "nerf": nerf_params}
        k1, k2 = jax.random.split(key)
        t_prop, w_prop = prop_forward(p, model_cfg, rays, k1, randomized)
        t_prop = jax.lax.stop_gradient(t_prop)
        w_prop = jax.lax.stop_gradient(w_prop)
        out = nerf_forward(p, model_cfg, rays, t_prop, w_prop, k2, randomized)
        loss_nerf, psnr = photometric_loss(out["rgb"], pixels)
        loss_dist = distortion_loss(out["s_vals"], out["weights"],
                                    train_cfg.dist_loss_reduction)
        total = loss_nerf + train_cfg.dist_loss_weight * loss_dist
        return total, {"psnr": psnr, "loss_nerf": loss_nerf,
                       "loss_dist": loss_dist}

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params["nerf"])
    lr = _lr(train_cfg, sched_count)
    new_nerf, new_opt = apply_updates_subtree(
        opt, params["nerf"], grads, opt_state["nerf"], lr)
    params = {"prop": params["prop"], "nerf": new_nerf}
    opt_state = {"prop": opt_state["prop"], "nerf": new_opt}
    aux["loss"] = loss
    aux["lr"] = lr
    return params, opt_state, aux


def reference_cadence_step(cfg: Config, state: TrainState, rays: Rays,
                           pixels, data_shards: int = 1
                           ) -> Tuple[TrainState, Dict[str, Any]]:
    """2 proposal updates + 1 nerf update; scheduler advances 3x."""
    opt = make_optimizer(cfg.train.weight_decay)
    params, opt_state = state.params, state.opt_state
    sched = state.sched_count
    key = state.key
    randomized = cfg.train.randomized

    if cfg.train.prop_inner_steps < 1:
        raise ValueError(
            "train.cadence='reference' is the 2+1 update structure "
            "(train.py:51-82) and needs train.prop_inner_steps >= 1; use "
            "cadence='joint' to train without separate proposal updates "
            f"(got prop_inner_steps={cfg.train.prop_inner_steps})")
    prop_losses = []
    for _ in range(cfg.train.prop_inner_steps):
        key, sub = jax.random.split(key)
        params, opt_state, lp = _prop_phase(
            params, opt, opt_state, cfg.model, cfg.train, rays, sub, sched,
            randomized, data_shards)
        sched = sched + 1
        prop_losses.append(lp)

    key, sub = jax.random.split(key)
    params, opt_state, aux = _nerf_phase(
        params, opt, opt_state, cfg.model, cfg.train, rays, pixels, sub, sched,
        randomized)
    sched = sched + 1
    aux["loss_prop"] = prop_losses[-1]

    new_state = TrainState(
        step=state.step + 1, sched_count=sched, params=params,
        opt_state=opt_state, key=key)
    return new_state, aux


def joint_cadence_step(cfg: Config, state: TrainState, rays: Rays,
                       pixels, data_shards: int = 1
                       ) -> Tuple[TrainState, Dict[str, Any]]:
    """One fused update of both subtrees (paper-style cadence)."""
    opt = make_optimizer(cfg.train.weight_decay)
    key, sub = jax.random.split(state.key)
    randomized = cfg.train.randomized

    def loss_fn(params):
        t_prop, w_prop, out = _forward_both(
            params, cfg.model, rays, sub, randomized)
        loss_nerf, psnr = photometric_loss(out["rgb"], pixels)
        loss_dist = distortion_loss(out["s_vals"], out["weights"],
                                    cfg.train.dist_loss_reduction)
        loss_prop = distillation_loss(
            jax.lax.stop_gradient(out["t_vals"]),
            jax.lax.stop_gradient(out["weights"]),
            t_prop, w_prop,
            collapsed=cfg.train.quirk_collapsed_bounds,
            data_shards=data_shards)
        total = (loss_nerf + cfg.train.dist_loss_weight * loss_dist + loss_prop)
        return total, {"psnr": psnr, "loss_nerf": loss_nerf,
                       "loss_dist": loss_dist, "loss_prop": loss_prop}

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    lr = _lr(cfg.train, state.sched_count)
    new_prop, opt_prop = apply_updates_subtree(
        opt, state.params["prop"], grads["prop"], state.opt_state["prop"], lr)
    new_nerf, opt_nerf = apply_updates_subtree(
        opt, state.params["nerf"], grads["nerf"], state.opt_state["nerf"], lr)
    aux["loss"] = loss
    aux["lr"] = lr

    new_state = TrainState(
        step=state.step + 1, sched_count=state.sched_count + 1,
        params={"prop": new_prop, "nerf": new_nerf},
        opt_state={"prop": opt_prop, "nerf": opt_nerf}, key=key)
    return new_state, aux


def _data_shards(mesh) -> int:
    """Size of the mesh "data" axis the ray batch is sharded over — sizes the
    PER-DEVICE einsum transient in the weight_bounds dispatch (advisor r4)."""
    return int(mesh.shape.get("data", 1)) if mesh is not None else 1


def make_train_step(cfg: Config, mesh=None, donate: bool = True):
    """Build the jitted train step for the configured cadence.

    With a mesh, the ray/pixel batch is expected sharded over the "data" axis
    and params replicated (or TP-sharded); XLA inserts gradient collectives.
    """
    fn = (reference_cadence_step if cfg.train.cadence == "reference"
          else joint_cadence_step)
    step = functools.partial(fn, cfg, data_shards=_data_shards(mesh))
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_banked_train_loop(cfg: Config, mesh=None, donate: bool = True):
    """K train steps gathering each step's ray batch ON DEVICE from an
    HBM-resident bank: ``loop(state, bank_rays, bank_pixels, idx_stack)``.

    The bank (every flattened dataset ray/pixel row, replicated per device —
    parallel/mesh.upload_bank) is uploaded once per run; per chunk only a
    [K, B] int32 index stack crosses the host->device boundary (~15x fewer
    bytes than staging gathered f32 rays, and no host-side gather at all).
    The gather is a local HBM read: indices sharded over "data", bank
    replicated, so GSPMD emits a communication-free per-device gather whose
    output matches the sharded-batch layout of ``make_train_loop``. Batch
    selection is bit-identical to host staging (RayDataset.index_stack is
    the same stateless stream batch_stack gathers; equivalence tested in
    tests/test_train.py)."""
    fn = (reference_cadence_step if cfg.train.cadence == "reference"
          else joint_cadence_step)
    shards = _data_shards(mesh)

    def loop(state, bank_rays, bank_pixels, idx_stack):
        from ..core.rays import rays_map

        def body(carry, idx):
            rays = rays_map(lambda x: x[idx], bank_rays)
            return fn(cfg, carry, rays, bank_pixels[idx], data_shards=shards)
        return jax.lax.scan(body, state, idx_stack)

    # Donate ONLY the state; the bank is reused across every chunk.
    return jax.jit(loop, donate_argnums=(0,) if donate else ())


def make_train_loop(cfg: Config, mesh=None, donate: bool = True):
    """K train steps fused into ONE XLA program via ``lax.scan``.

    Call as ``loop(state, rays_stack, pixels_stack)`` where every leaf of the
    ray pytree has a leading [K] axis (one entry per step). Returns the final
    state and the per-step aux dict stacked to [K].

    One host dispatch per K steps instead of per step. The per-call dispatch
    overhead is irrelevant on a local TPU host, but over a remote-device
    tunnel it can dwarf the step itself; training loops should sync with the
    host only at log/checkpoint boundaries regardless (no host round trips
    inside the scan body; all scalars come back as stacked device arrays).
    """
    fn = (reference_cadence_step if cfg.train.cadence == "reference"
          else joint_cadence_step)
    shards = _data_shards(mesh)

    def loop(state, rays_stack, pixels_stack):
        def body(carry, batch):
            rays, pixels = batch
            return fn(cfg, carry, rays, pixels, data_shards=shards)
        return jax.lax.scan(body, state, (rays_stack, pixels_stack))

    return jax.jit(loop, donate_argnums=(0,) if donate else ())
