"""Training driver: data -> mesh -> jitted step -> metrics/checkpoints.

Counterpart of /root/reference/train.py:15-121 (``train_model``/``eval_model``)
rebuilt TPU-first: one jitted step (whatever the cadence), sharded batches over
the "data" mesh axis, host-0 logging, single-tree checkpoints with exact
resume, rays/s + steps/s counters (the BASELINE.json metric).
"""
from __future__ import annotations

import functools
import signal
import threading
from typing import Callable, Optional

import jax
import numpy as np

from ..config import Config
from ..core.rays import Rays
from ..data import get_dataset
from ..losses.photometric import photometric_loss
from ..models.mipnerf360 import render_rays
from ..parallel.mesh import (make_mesh, shard_batch, shard_batch_stack,
                             shard_batch_stack_local, shard_index_stack,
                             shard_index_stack_local, shard_params,
                             upload_bank)
from ..utils.logging import MetricsLogger, Timer
from .checkpoint import (AsyncCheckpointer, latest_checkpoint_step,
                         restore_checkpoint, save_checkpoint)
from .state import TrainState, init_train_state
from .step import make_banked_train_loop, make_train_loop

# Auto threshold for device-bank staging: keep the replicated per-device ray
# bank under this many bytes (the quality model's activations want most of a
# 16 GB v5e HBM at flagship batch). 2 GiB covers e.g. nerf_360 bicycle at
# factor 4 (~19M rays, ~1.1 GB); full-res pod-scale datasets fall back to
# host staging automatically.
_BANK_AUTO_BYTES = 2 * 1024**3


def _bank_nbytes(dataset) -> int:
    width = sum(int(a.shape[-1]) for a in dataset.rays)
    if dataset.pixels is not None:
        width += int(dataset.pixels.shape[-1])
    return dataset.n_rays * width * 4


def use_device_bank(cfg: Config, dataset) -> bool:
    """Resolve train.stage_mode ("auto" picks device_bank while the bank
    fits _BANK_AUTO_BYTES)."""
    mode = cfg.train.stage_mode
    if mode == "host":
        return False
    if mode == "device_bank":
        return True
    assert mode == "auto", mode
    return _bank_nbytes(dataset) <= _BANK_AUTO_BYTES


@functools.lru_cache(maxsize=8)  # Config is a frozen dataclass (hashable)
def make_eval_fn(cfg: Config):
    """Jitted single-batch PSNR (reference eval_model, train.py:106-116 —
    which also evaluates one batch). Cached per config so repeated
    evaluate_batch calls compile once."""

    @jax.jit
    def eval_fn(params, rays: Rays, pixels):
        out = render_rays(params, cfg.model, rays, jax.random.PRNGKey(0),
                          randomized=False)
        _, psnr = photometric_loss(out["rgb"], pixels)
        return psnr

    return eval_fn


def evaluate_batch(cfg: Config, params, rays: Rays, pixels) -> float:
    return float(jax.device_get(make_eval_fn(cfg)(params, rays, pixels)))


def evaluate_image(cfg: Config, params, dataset, index: int,
                   mesh=None) -> dict:
    """Render one full held-out view and score it (PSNR, and SSIM when the
    view is large enough for the 11x11 SSIM window). The reference's
    in-training eval is a single random 64-ray batch (train.py:106-116);
    this is the framework's own quality signal at the image level, reusing
    the jitted chunked render from apps/eval."""
    from ..core.rays import rays_to_device
    from ..models.mipnerf360 import render_image
    from ..utils import metrics

    rays_np, pix = dataset.image(index)
    rgb, _, _ = render_image(params, cfg.model, rays_to_device(rays_np),
                             chunk=cfg.train.eval_image_chunk, mesh=mesh)
    rgb = np.asarray(jax.device_get(rgb)).reshape(dataset.h, dataset.w, 3)
    out = {}
    if pix is not None:
        target = pix.reshape(dataset.h, dataset.w, 3)
        out["eval/psnr_image"] = float(metrics.psnr(rgb, target))
        if min(dataset.h, dataset.w) >= 11:
            out["eval/ssim"] = float(metrics.ssim(rgb, target))
    return out


def evaluate_images(cfg: Config, params, dataset, *, mesh=None) -> dict:
    """Score held-out views and return MEAN eval/psnr_image + eval/ssim.

    ``train.eval_image_views`` selects coverage: -1 renders ALL test views
    (the claim-grade mean); k >= 1 renders a FIXED window of the first k
    views — fixed rather than cycling so the mean is comparable across eval
    boundaries (a cycling single view confounds view difficulty with training
    progress). Per-view PSNRs are returned under eval/psnr_view_<i> so the
    metrics log carries the full table."""
    k = cfg.train.eval_image_views
    n = dataset.n_images
    indices = list(range(n if k <= 0 or k >= n else k))
    psnrs, ssims, out = {}, {}, {}
    for i in indices:
        one = evaluate_image(cfg, params, dataset, i, mesh=mesh)
        if "eval/psnr_image" in one:
            psnrs[i] = one["eval/psnr_image"]
        if "eval/ssim" in one:
            ssims[i] = one["eval/ssim"]
    if psnrs:
        out["eval/psnr_image"] = float(np.mean(list(psnrs.values())))
        out.update({f"eval/psnr_view_{i}": v for i, v in psnrs.items()})
    if ssims:
        out["eval/ssim"] = float(np.mean(list(ssims.values())))
    return out


def stage_batch(mesh, dataset, k: int, batch_size: int, seed: int,
                at_step: int):
    """Assemble + upload a [K, B, c] stack of k per-step batches.

    Single-process: one native-sampler gather of the full stack. Multi-host:
    each process gathers ONLY its [K, B/P, c] shard of the same stateless
    index stream and the global array is built from process-local data
    (jax.make_array_from_process_local_data) — bit-identical to the global
    path (tests/_multihost_staging_worker.py) but with host work and
    host->device bytes scaling per-host, not per-pod."""
    if jax.process_count() > 1:
        rays_np, pix_np = dataset.batch_stack_local(
            k, batch_size, seed, at_step,
            jax.process_index(), jax.process_count())
        return shard_batch_stack_local(mesh, rays_np, pix_np)
    rays_np, pix_np = dataset.batch_stack(k, batch_size, seed, at_step)
    return shard_batch_stack(mesh, rays_np, pix_np)


def chunk_len(at_step: int, max_steps: int, chunk: int) -> int:
    """Steps in the chunk starting at ``at_step``: chunk boundaries align to
    multiples of ``chunk`` regardless of resume point. The single source of
    truth for chunk length — ``chunk_starts`` (the async stager's schedule)
    and ``stage`` (the consumer) must agree or the stateless ray-counter
    stream would silently gap/overlap."""
    return min(chunk - at_step % chunk, max_steps - at_step)


def chunk_starts(start_step: int, max_steps: int, chunk: int):
    """The deterministic sequence of chunk-start steps the train loop visits."""
    s = start_step
    while s < max_steps:
        yield s
        s += chunk_len(s, max_steps, chunk)


class BackgroundStager:
    """Double-buffered background staging: a worker thread assembles + uploads
    batch stacks AHEAD of the train loop, so the native-sampler gather and the
    host->device transfer overlap device compute instead of running on the
    main thread between dispatch and sync (VERDICT r4 weak #2: that serial
    host work cost 2.8% of end-to-end throughput).

    Safe because the batch index stream is stateless in (seed, global ray
    counter) — assembly order/thread has no effect on WHAT is staged — and
    jax device_put is thread-safe. The queue holds at most ``depth`` staged
    chunks (each a [K, B, c] stack already on device), bounding HBM held by
    prefetch. Worker exceptions re-raise in the consumer at the next get().
    """

    def __init__(self, stage_fn, steps, depth: int = 2):
        import queue

        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(stage_fn, list(steps)), daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        import queue

        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _await_slot(self) -> bool:
        # Reserve a queue slot BEFORE assembling the next chunk: this is the
        # single producer, so a non-full queue guarantees the following put
        # succeeds, and the staged-chunk footprint stays at the documented
        # depth+1 (queued + one being assembled) instead of depth+2 (an
        # assembled chunk parked in the blocked put).
        import time as _time

        while not self._stop.is_set():
            if not self._q.full():
                return True
            _time.sleep(0.005)
        return False

    def _run(self, stage_fn, steps):
        try:
            for s in steps:
                if not self._await_slot():
                    return
                if not self._put((stage_fn(s), None)):
                    return
            self._put((None, None))  # end of stream
        except BaseException as e:  # re-raised in get()
            self._put((None, e))

    def get(self):
        """Next staged item, or None at end of stream; re-raises worker errors."""
        item, exc = self._q.get()
        if exc is not None:
            raise exc
        return item

    def warm(self, timeout: float = 300.0) -> None:
        """Block until the prefetch queue is full (or the worker finished).

        For timing harnesses: a measurement window opened after ``warm()``
        excludes the cold-start assemblies, so the window sees only the
        steady-state one-assembly-per-consumed-item cost (bench.py staging
        mode; without this the first timed round blocks on a serial cold
        assembly and reads biased-low)."""
        import time as _time

        deadline = _time.monotonic() + timeout
        while (self._q.qsize() < self._q.maxsize and self._thread.is_alive()
               and _time.monotonic() < deadline):
            _time.sleep(0.005)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=30)


def install_preemption_handler(signals=(signal.SIGTERM, signal.SIGINT)):
    """Failure-detection hook (SURVEY.md §5): a crash in the reference loses
    everything since the last periodic checkpoint (train.py:98-100). Here
    SIGTERM/SIGINT (the preemption notice on TPU VMs) sets a flag; the train
    loop flushes a checkpoint at the next chunk boundary and exits cleanly.

    The FIRST signal sets the flag and immediately restores the previous
    handlers, so a second signal force-interrupts (e.g. when the process is
    blocked in a device_get that never returns — a documented remote-tunnel
    failure mode). Returns (flag, restore). Signal handlers only work in the
    main thread — elsewhere (tests, driver harnesses) the flag degrades to
    never-set."""
    flag = threading.Event()
    if threading.current_thread() is not threading.main_thread():
        return flag, lambda: None
    prev = {}

    def restore():
        for s, h in prev.items():
            signal.signal(s, h)

    def handler(signum, frame):
        flag.set()
        restore()  # second signal gets the default/previous behavior

    prev.update({s: signal.signal(s, handler) for s in signals})
    return flag, restore


def train(cfg: Config, *, max_steps: Optional[int] = None,
          resume: bool = False,
          on_step: Optional[Callable[[int, dict], None]] = None) -> TrainState:
    """Run training; returns the final TrainState."""
    max_steps = max_steps if max_steps is not None else cfg.train.max_steps

    # Anchor the LR-decay horizon NOW so it survives resume-extension: the
    # resolved value lands in the checkpoint's config.json (authoritative on
    # resume), so raising train.max_steps later extends training on the
    # original schedule instead of re-inflating the LR (the r3 resume run
    # dipped 11 dB when the schedule silently re-mapped onto the new horizon).
    if cfg.train.lr_max_steps == 0:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, lr_max_steps=max_steps))

    mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
    dataset = get_dataset(cfg.data, "train",
                          white_bkgd=cfg.model.white_bkgd)
    try:
        eval_dataset = get_dataset(cfg.data, "test",
                                   white_bkgd=cfg.model.white_bkgd)
    except FileNotFoundError as e:
        # Only the expected missing-split case falls back; anything else
        # (corrupt data, a typo'd loader kwarg, ...) propagates. The fallback
        # warns loudly because eval/* would otherwise silently score the
        # TRAIN split.
        import warnings

        warnings.warn(
            f"no test split found ({e}); eval/* metrics will be computed on "
            "the TRAIN split", RuntimeWarning, stacklevel=2)
        eval_dataset = dataset

    state = init_train_state(
        jax.random.PRNGKey(cfg.train.seed), cfg.model, cfg.train)
    start_step = 0
    if resume and latest_checkpoint_step(cfg.train.checkpoint_dir) is not None:
        state = restore_checkpoint(cfg.train.checkpoint_dir, state)
        start_step = int(state.step)
    state = state._replace(params=shard_params(mesh, state.params))

    bank = None
    if use_device_bank(cfg, dataset):
        bank = upload_bank(mesh, dataset.rays, dataset.pixels)
        loop_fn = make_banked_train_loop(cfg, mesh)
    else:
        loop_fn = make_train_loop(cfg, mesh)
    logger = MetricsLogger(cfg.train.checkpoint_dir)
    if jax.process_index() == 0:
        import os
        os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
        with open(f"{cfg.train.checkpoint_dir}/config.json", "w") as f:
            f.write(cfg.to_json())

    eval_batches = eval_dataset.batches(cfg.train.batch_size,
                                        seed=cfg.train.seed + 1)
    timer = Timer()

    # Steps are dispatched in scanned chunks of ``log_every``: one XLA
    # program per chunk (train/step.py:make_train_loop), host sync only at
    # log boundaries. eval/save cadences land on the first chunk boundary at
    # or past their multiple (exact when they are multiples of log_every).
    chunk = max(1, cfg.train.log_every)

    def crossed(every: int, start: int, end: int) -> bool:
        return bool(every) and (end // every) > (start // every)

    def stage(at_step: int):
        """Stage the next chunk's loop_fn args. Device-bank mode ships only
        a [K, B] int32 index stack (the bank already sits in HBM); host mode
        assembles + uploads the gathered [K, B, c] batch stack."""
        k = chunk_len(at_step, max_steps, chunk)
        B, seed = cfg.train.batch_size, cfg.train.seed
        if bank is not None:
            if jax.process_count() > 1:
                idx = dataset.index_stack_local(
                    k, B, seed, at_step,
                    jax.process_index(), jax.process_count())
                idx = shard_index_stack_local(mesh, idx)
            else:
                idx = shard_index_stack(
                    mesh, dataset.index_stack(k, B, seed, at_step))
            return k, (*bank, idx)
        rays, pixels = stage_batch(mesh, dataset, k, B, seed, at_step)
        return k, (rays, pixels)

    step = start_step
    # Best-eval tracking persists across --resume via the manifest: without
    # this, the first post-resume eval boundary would overwrite a better
    # ckpt_best from the original run (observed live: 31.07 dB best replaced
    # by a 30.62 dB "best" at the first extension boundary).
    best_eval_psnr = float("-inf")
    if resume:
        import json as _json
        import os as _os

        manifest_path = _os.path.join(cfg.train.checkpoint_dir,
                                      "manifest.json")
        if _os.path.exists(manifest_path):
            try:
                with open(manifest_path) as f:
                    best_eval_psnr = float(
                        _json.load(f).get("best_psnr_image", float("-inf")))
            except (OSError, ValueError, _json.JSONDecodeError):
                pass
    preempted, restore_signals = install_preemption_handler()
    ckpt_writer = AsyncCheckpointer()
    eval_fn = None  # built lazily (jitted once) on the first eval boundary
    nonfinite_warned = False
    # Batch staging: background double-buffered thread by default (assembly +
    # upload overlap device compute AND the main thread's device_get sync);
    # train.async_staging=False falls back to inline staging on this thread
    # (same batches either way — the index stream is stateless).
    stager = None
    staged = None
    if cfg.train.async_staging:
        # Queue depth bounds staged-chunk HBM: host mode stages full
        # [K, B, c] f32 stacks (~90 MB at flagship shapes) so depth=1 keeps
        # the prefetch footprint at the pre-r5 inline level (current + one
        # ahead) while still overlapping assembly with device compute;
        # bank mode ships only [K, B] int32 index stacks (~1.6 MB) where a
        # deeper queue is free.
        stager = BackgroundStager(stage, chunk_starts(step, max_steps, chunk),
                                  depth=2 if bank is not None else 1)
    else:
        staged = stage(step) if step < max_steps else None
    try:
        while step < max_steps and not preempted.is_set():
            if stager is not None:
                staged = stager.get()
            if staged is None:
                break
            k, loop_args = staged

            profiling = (cfg.train.profile_dir
                         and step <= cfg.train.profile_start < step + k)
            if profiling:
                jax.profiler.start_trace(cfg.train.profile_dir)
            state, aux = loop_fn(state, *loop_args)
            if profiling:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()

            # Inline-staging fallback: prefetch the next chunk while the
            # device executes this one (dispatch above is async; the
            # device_get below is the sync point). The background stager
            # needs nothing here — its thread is already ahead.
            if stager is None:
                staged = stage(step + k) if step + k < max_steps else None

            # ONE batched device_get for all log scalars: per-metric gets
            # are a blocking round trip EACH, and over the remote-device
            # tunnel 7 round trips per chunk cost ~7% of end-to-end
            # throughput (measured r5: trainer 44.2k vs bench 47.7k rays/s
            # with the same staging path; single-transfer sync closes it).
            aux_host = {name: float(v) for name, v in jax.device_get(
                {name: v[-1] for name, v in aux.items()}).items()}
            if not nonfinite_warned and not all(
                    np.isfinite(v) for v in aux_host.values()):
                # Loud once-per-run notice: a NaN loss usually means training
                # is dead from here on (observed live: the NDC-quirk-on-360
                # run trained 400 more steps on loss=nan before r5 noticed).
                # train.check_nans=True escalates to an abort with the
                # offending param paths.
                nonfinite_warned = True
                if jax.process_index() == 0:  # host-0-only, like all logging
                    bad = {n: v for n, v in aux_host.items()
                           if not np.isfinite(v)}
                    print(f"[warn] non-finite training metrics at step "
                          f"{step + k}: {bad} — training is likely dead; set "
                          "train.check_nans=true to abort with offending "
                          "params")
            if cfg.train.check_nans:
                from ..utils.checks import assert_tree_finite

                # aux values are Python floats; wrap as numpy scalars so the
                # dtype-based leaf filter in count_nonfinite inspects them too.
                aux_np = {name: np.float32(v) for name, v in aux_host.items()}
                assert_tree_finite(
                    {"params": state.params, "aux": aux_np},
                    context=f"at step {step + k}")
            dt = timer.lap()
            new_step = step + k
            scalars = {
                "train/loss": aux_host.get("loss", 0.0),
                "train/avg_psnr": aux_host.get("psnr", 0.0),
                "train/lr": aux_host.get("lr", 0.0),
                "train/loss_nerf": aux_host.get("loss_nerf", 0.0),
                "train/loss_dist": aux_host.get("loss_dist", 0.0),
                "train/loss_prop": aux_host.get("loss_prop", 0.0),
                "perf/steps_per_sec": k / dt,
                "perf/rays_per_sec": k * cfg.train.batch_size / dt,
            }
            logger.log(new_step, scalars)
            if on_step is not None:
                on_step(new_step, scalars)

            if crossed(cfg.train.eval_every, step, new_step):
                if eval_fn is None:
                    eval_fn = make_eval_fn(cfg)
                er, ep = next(eval_batches)
                er, ep = shard_batch(mesh, er, ep)
                psnr = float(jax.device_get(eval_fn(state.params, er, ep)))
                # NOISE-DOMINATED metric, kept only for cadence parity with
                # reference eval_model (train.py:106-116, one random 64-ray
                # batch): a single small-batch PSNR draw has ~4 dB std
                # (measured, PARITY_PSNR.json train_psnr_ablation) — it is
                # NOT a quality signal; eval/psnr_image is. The key name
                # says so because two rounds of misreadings came from it
                # (the r3 "deficit" false alarm; the 22.8-vs-27.1 gap).
                # It is also on the reference's CHANNEL-SUMMED MSE scale:
                # a constant 10*log10(3) ~= 4.77 dB below image PSNR
                # (losses/photometric.py docstring).
                logger.log(new_step, {"eval/psnr_batch_noisy": psnr})

            if (crossed(cfg.train.eval_image_every, step, new_step)
                    and eval_dataset.n_images > 0):
                img_metrics = evaluate_images(
                    cfg, state.params, eval_dataset, mesh=mesh)
                logger.log(new_step, img_metrics)
                mean_psnr = img_metrics.get("eval/psnr_image")
                if (cfg.train.keep_best and mean_psnr is not None
                        and mean_psnr > best_eval_psnr):
                    best_eval_psnr = mean_psnr
                    ckpt_writer.save(
                        cfg.train.checkpoint_dir, state,
                        cfg.train.keep_checkpoints, name="best",
                        manifest_extra={"best_psnr_image": mean_psnr})

            if crossed(cfg.train.save_every, step, new_step):
                # Device-side snapshot + background write; training continues.
                ckpt_writer.save(cfg.train.checkpoint_dir, state,
                                 cfg.train.keep_checkpoints)
            step = new_step

    finally:
        # Always restore process-global signal handlers and drain/stop the
        # staging + checkpoint workers, even when the loop raises
        # (NonFiniteError, staging failure, re-raised ckpt-write error, ...).
        if stager is not None:
            stager.close()
        restore_signals()
        try:
            ckpt_writer.close()  # drain in-flight write before the sync save
        except Exception:
            logger.close()
            raise
    if preempted.is_set() and step < max_steps:
        print(f"[preempted] flushing checkpoint at step {step}")
    save_checkpoint(cfg.train.checkpoint_dir, state, cfg.train.keep_checkpoints)
    logger.close()
    return state
