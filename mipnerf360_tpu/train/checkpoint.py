"""Checkpoint save/restore with exact resume.

The reference saves raw ``state_dict`` pairs every 100 steps and its
``--continue_training`` reloads only the final pair, restarting the step
counter and scheduler at 0 (train.py:39-43,98-103; SURVEY.md §5). Here a
checkpoint is ONE tree — {step, sched_count, params, opt_state, key} — so
resume is bit-exact including schedule position and PRNG stream.

Format: flax msgpack bytes + a JSON manifest; multi-host safe (process 0
writes, all processes read). Atomic via tmpfile rename.
"""
from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax
import numpy as np
from flax import serialization

from .state import TrainState

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


class AsyncCheckpointer:
    """Non-blocking checkpoint writes (SURVEY.md §5: async writes).

    ``save()`` snapshots the state ON DEVICE (cheap copy ops, ordered before
    any later donating train step) and hands the host transfer +
    serialization + atomic write to a single worker thread, so training does
    not stall on the device->host pull (seconds over a remote-device link).
    At most one write is in flight; a second ``save`` first drains the
    previous one. Call ``wait()`` before process exit / the final sync save.
    """

    def __init__(self):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
        self._pending = None

    @staticmethod
    def _snapshot(x):
        if isinstance(x, jax.Array):
            import jax.numpy as jnp

            return jnp.copy(x)
        return x

    def save(self, ckpt_dir: str, state: TrainState, keep: int = 3,
             name: Optional[str] = None, manifest_extra: Optional[dict] = None):
        snap = jax.tree_util.tree_map(self._snapshot, state)
        self.wait()
        self._pending = self._pool.submit(
            save_checkpoint, ckpt_dir, snap, keep, name, manifest_extra)

    def wait(self):
        """Drain the in-flight write (re-raises its exception, if any)."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def close(self):
        self.wait()
        self._pool.shutdown(wait=True)


def _is_primary() -> bool:
    return jax.process_index() == 0


def save_checkpoint(ckpt_dir: str, state: TrainState, keep: int = 3,
                    name: Optional[str] = None,
                    manifest_extra: Optional[dict] = None) -> str:
    """Write the state tree; prune to the newest ``keep`` checkpoints.

    ``name`` overrides the step-derived filename (e.g. "best" ->
    ckpt_best.msgpack, which the numeric pruner never touches); restore it
    with ``restore_checkpoint(..., step="best")``. ``manifest_extra`` keys are
    merged into manifest.json (read-modify-write, so a "best" save records
    best_step without clobbering latest_step)."""
    step = int(jax.device_get(state.step))
    path = os.path.join(ckpt_dir, f"ckpt_{name if name else step}.msgpack")
    if _is_primary():
        os.makedirs(ckpt_dir, exist_ok=True)
        host_state = jax.device_get(state)
        data = serialization.to_bytes(host_state)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        manifest_path = os.path.join(ckpt_dir, "manifest.json")
        manifest = {}
        if os.path.exists(manifest_path):
            try:
                with open(manifest_path) as f:
                    manifest = json.load(f)
            except (OSError, json.JSONDecodeError):
                manifest = {}
        manifest["latest_step" if name is None else f"{name}_step"] = step
        manifest.update(manifest_extra or {})
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)
        if name is None:
            _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int):
    steps = sorted(
        int(m.group(1)) for m in map(_CKPT_RE.match, os.listdir(ckpt_dir)) if m)
    for s in steps[:-keep] if keep > 0 else []:
        try:
            os.remove(os.path.join(ckpt_dir, f"ckpt_{s}.msgpack"))
        except OSError:
            pass


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1))
             for m in map(_CKPT_RE.match, os.listdir(ckpt_dir)) if m]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       step=None) -> TrainState:
    """Restore into the structure of ``template`` (from init_train_state).

    ``step``: None = latest numbered checkpoint; an int = that step; a name
    string (e.g. "best") = the correspondingly named checkpoint."""
    if step is None:
        step = latest_checkpoint_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    with open(path, "rb") as f:
        data = f.read()
    # Only the tree structure + shapes/dtypes matter — never pull template
    # values off-device (a leaf-by-leaf device_get over a remote TPU tunnel
    # costs minutes for a large model).
    host_template = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype), template)
    return serialization.from_bytes(host_template, data)
