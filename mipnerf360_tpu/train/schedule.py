"""Learning-rate schedule: log-linear lerp with sine warmup delay.

Counterpart of /root/reference/intern/scheduler.py:4-23 (``lr_decay``), as a
pure function of the step — jit-safe, no scheduler object state.

Note the reference steps its scheduler 3x per global step (train.py:64,82), so
LR reaches lr_final at max_steps/3; with the "reference" cadence our train
loop advances the schedule identically.
"""
from __future__ import annotations

import jax.numpy as jnp


def log_lerp_lr(step, lr_init: float, lr_final: float, max_steps: int,
                lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """LR at ``step`` (may be traced). Matches scheduler.py:13-23 semantics."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp
