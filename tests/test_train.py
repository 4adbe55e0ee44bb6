"""Training integration tests: loss decreases, cadences, resume, schedule."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf360_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from mipnerf360_tpu.core.rays import rays_map, rays_to_device
from mipnerf360_tpu.data import get_dataset
from mipnerf360_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from mipnerf360_tpu.train import (
    init_train_state,
    log_lerp_lr,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from mipnerf360_tpu.train.step import make_train_loop


def tiny_config(cadence="joint", **train_overrides) -> Config:
    return Config(
        model=ModelConfig(num_samples=8, hidden_proposal=16, hidden_nerf=32,
                          nerf_depth=2, compute_dtype="float32",
                          white_bkgd=True),
        train=TrainConfig(max_steps=100, batch_size=64, lr_init=2e-3,
                          lr_final=2e-4, lr_delay_steps=5, cadence=cadence,
                          **train_overrides),
        data=DataConfig(dataset="synthetic", synthetic_resolution=16,
                        synthetic_views=4),
        mesh=MeshConfig(data=1, model=1),
    )


class TestSchedule:
    def test_endpoints(self):
        lr0 = float(log_lerp_lr(0, 2e-3, 2e-5, 1000, 0, 1.0))
        lr_end = float(log_lerp_lr(1000, 2e-3, 2e-5, 1000, 0, 1.0))
        assert lr0 == pytest.approx(2e-3, rel=1e-5)
        assert lr_end == pytest.approx(2e-5, rel=1e-5)

    def test_warmup_delay(self):
        # at step 0 with delay, lr is scaled by lr_delay_mult
        lr0 = float(log_lerp_lr(0, 2e-3, 2e-5, 1000, 100, 0.1))
        assert lr0 == pytest.approx(2e-4, rel=1e-4)
        # past the delay window, no scaling
        lr_mid = float(log_lerp_lr(100, 2e-3, 2e-5, 1000, 100, 0.1))
        assert lr_mid == pytest.approx(float(log_lerp_lr(100, 2e-3, 2e-5, 1000, 0, 1.0)), rel=1e-5)

    def test_geometric_interpolation(self):
        lr_mid = float(log_lerp_lr(500, 1e-2, 1e-4, 1000, 0, 1.0))
        assert lr_mid == pytest.approx(1e-3, rel=1e-4)

    def test_lr_max_steps_decouples_horizon(self):
        """train.lr_max_steps pins the decay horizon independently of
        max_steps, so resume-extension (max_steps raised) keeps the original
        schedule (VERDICT r3 weak #4: the re-mapped LR caused an 11 dB dip)."""
        from mipnerf360_tpu.train.step import _lr

        anchored = TrainConfig(max_steps=4000, lr_max_steps=1500,
                               lr_init=2e-3, lr_final=2e-5, lr_delay_steps=0)
        original = TrainConfig(max_steps=1500, lr_init=2e-3, lr_final=2e-5,
                               lr_delay_steps=0)
        for count in [0, 750, 1500, 2000, 4000]:
            assert float(_lr(anchored, count)) == pytest.approx(
                float(_lr(original, count)), rel=1e-6)
        # past the anchored horizon the LR stays at lr_final
        assert float(_lr(anchored, 3000)) == pytest.approx(2e-5, rel=1e-5)


def _run_steps(cfg: Config, n_steps: int, state=None):
    mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
    ds = get_dataset(cfg.data, "train")
    if state is None:
        state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        state = state._replace(params=shard_params(mesh, state.params))
    step_fn = make_train_step(cfg, mesh)
    batches = ds.batches(cfg.train.batch_size, seed=0)
    history = []
    for _ in range(n_steps):
        rays_np, pix_np = next(batches)
        rays, pixels = shard_batch(mesh, rays_np, pix_np)
        state, aux = step_fn(state, rays, pixels)
        history.append({k: float(v) for k, v in jax.device_get(aux).items()})
    return state, history


class TestTrainStep:
    def test_joint_cadence_loss_decreases(self):
        cfg = tiny_config("joint")
        _, hist = _run_steps(cfg, 60)
        first = np.mean([h["psnr"] for h in hist[:10]])
        last = np.mean([h["psnr"] for h in hist[-10:]])
        assert last > first + 1.0, (first, last)  # PSNR improves by >1dB

    def test_quirk_exact_flags_plumb_through_step(self):
        """The quirk-exact ablation flags (model.resample_u_typo,
        train.quirk_collapsed_bounds) must reach the fused step: both
        cadences run finite with them on, and the collapsed-bounds flag
        changes the proposal loss."""
        cfg = tiny_config("reference")
        cfg_q = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, resample_u_typo=True),
            train=dataclasses.replace(cfg.train, quirk_collapsed_bounds=True))
        _, hist_q = _run_steps(cfg_q, 2)
        assert all(np.isfinite(h["loss"]) for h in hist_q)
        _, hist = _run_steps(cfg, 2)
        # collapsed bounds sum over the batch -> much larger hinge loss
        assert hist_q[0]["loss_prop"] > hist[0]["loss_prop"]

    def test_reference_cadence_runs_and_improves(self):
        cfg = tiny_config("reference")
        state, hist = _run_steps(cfg, 40)
        assert int(state.sched_count) == 120  # 3 scheduler steps per global step
        first = np.mean([h["psnr"] for h in hist[:5]])
        last = np.mean([h["psnr"] for h in hist[-5:]])
        assert last > first, (first, last)

    def test_all_finite_over_steps(self):
        cfg = tiny_config("joint")
        state, hist = _run_steps(cfg, 20)
        for h in hist:
            assert np.isfinite(h["loss"])
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_step_counters(self):
        cfg = tiny_config("joint")
        state, _ = _run_steps(cfg, 7)
        assert int(state.step) == 7
        assert int(state.sched_count) == 7


class TestTrainLoop:
    def test_scanned_loop_matches_sequential(self):
        """K scanned steps (one XLA program) == K per-step dispatches."""
        from mipnerf360_tpu.core.rays import dummy_rays
        from mipnerf360_tpu.parallel.mesh import shard_batch_stack

        cfg = tiny_config()
        mesh = make_mesh(1, 1)
        state0 = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        state0 = state0._replace(params=shard_params(mesh, state0.params))
        rays_np = dummy_rays(cfg.train.batch_size)
        pix_np = np.random.default_rng(0).uniform(
            0, 1, (cfg.train.batch_size, 3)).astype(np.float32)

        step_fn = make_train_step(cfg, mesh, donate=False)
        rays, pixels = shard_batch(mesh, rays_np, pix_np)
        s_seq = state0
        for _ in range(4):
            s_seq, aux_seq = step_fn(s_seq, rays, pixels)

        stack = lambda x: np.broadcast_to(x[None], (4,) + x.shape)
        rays_s, pix_s = shard_batch_stack(
            mesh, rays_map(stack, rays_np), stack(pix_np))
        loop_fn = make_train_loop(cfg, mesh, donate=False)
        s_scan, auxs = loop_fn(state0, rays_s, pix_s)

        for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                        jax.tree_util.tree_leaves(s_scan.params)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        assert auxs["loss"].shape == (4,)
        assert float(aux_seq["loss"]) == pytest.approx(
            float(auxs["loss"][-1]), rel=1e-5)
        assert int(s_scan.step) == 4


def _assert_param_trees_close(p_a, p_b, rtol, atol):
    flat_a, tdef_a = jax.tree_util.tree_flatten_with_path(p_a)
    flat_b, tdef_b = jax.tree_util.tree_flatten_with_path(p_b)
    assert tdef_a == tdef_b
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


class TestSharding:
    """Sharded-step equivalence, asserted on the FULL parameter tree after
    >=5 optimizer steps (not just the scalar loss). Bit-exactness is not the
    contract — psum reduces per-shard partial sums in a different order than
    the single-device sum, an ulp-level f32 difference by construction — but
    every parameter must agree to f32-tight tolerance (DESIGN.md §4)."""

    @pytest.mark.parametrize("cadence", ["joint", "reference"])
    def test_data_parallel_matches_single_device(self, cadence):
        cfg1 = tiny_config(cadence)
        cfg8 = dataclasses.replace(cfg1, mesh=MeshConfig(data=8, model=1))
        s1, h1 = _run_steps(cfg1, 5)
        s8, h8 = _run_steps(cfg8, 5)
        _assert_param_trees_close(s1.params, s8.params,
                                  rtol=2e-4, atol=1e-6)
        for a, b in zip(h1, h8):
            assert a["loss"] == pytest.approx(b["loss"], rel=2e-3), (a, b)

    @pytest.mark.parametrize("cadence", ["joint", "reference"])
    def test_tensor_parallel_matches_single_device(self, cadence):
        cfg1 = tiny_config(cadence)
        cfg_tp = dataclasses.replace(cfg1, mesh=MeshConfig(data=4, model=2))
        s1, h1 = _run_steps(cfg1, 5)
        stp, htp = _run_steps(cfg_tp, 5)
        _assert_param_trees_close(s1.params, stp.params,
                                  rtol=2e-4, atol=1e-6)
        for a, b in zip(h1, htp):
            assert a["loss"] == pytest.approx(b["loss"], rel=2e-3)


class TestCheckpoint:
    def test_exact_resume(self, tmp_path):
        cfg = tiny_config("joint")
        state, _ = _run_steps(cfg, 5)
        save_checkpoint(str(tmp_path), state, keep=2)

        template = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        restored = restore_checkpoint(str(tmp_path), template)
        assert int(restored.step) == 5
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # continuing from restored must match continuing from original
        s1, h1 = _run_steps(cfg, 3, state=state)
        s2, h2 = _run_steps(cfg, 3, state=restored)
        for a, b in zip(h1, h2):
            assert a["loss"] == pytest.approx(b["loss"], rel=1e-5)

    def test_resume_extension_keeps_lr_schedule(self, tmp_path):
        """Trainer anchors lr_max_steps into the saved config.json, so the
        resume-extension flow (reload saved config, raise max_steps) keeps the
        ORIGINAL decay: LR past the original horizon sits at lr_final instead
        of re-inflating."""
        import json

        from mipnerf360_tpu.train.trainer import train as run_train

        cfg = tiny_config("joint", save_every=4, eval_every=0, log_every=1,
                          checkpoint_dir=str(tmp_path / "ckpt"))
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, max_steps=4,
                                           lr_delay_steps=0))
        run_train(cfg)
        with open(tmp_path / "ckpt" / "config.json") as f:
            saved = json.load(f)
        assert saved["train"]["lr_max_steps"] == 4

        cfg2 = Config.from_json(json.dumps(saved))
        cfg2 = dataclasses.replace(
            cfg2, train=dataclasses.replace(cfg2.train, max_steps=8))
        lrs = {}
        run_train(cfg2, resume=True,
                  on_step=lambda s, sc: lrs.__setitem__(s, sc["train/lr"]))
        assert min(lrs) > 4  # actually resumed, not retrained
        for s, lr in lrs.items():
            assert lr == pytest.approx(cfg.train.lr_final, rel=1e-4), (s, lr)

    def test_keep_best_survives_resume(self, tmp_path):
        """best-eval tracking must persist across --resume (manifest
        best_psnr_image): a resumed run whose evals are all worse must NOT
        overwrite ckpt_best (observed live in r4: a 31.07 dB best replaced
        by a 30.62 dB 'best' at the first extension boundary)."""
        import json
        import os

        from mipnerf360_tpu.train.trainer import train as run_train

        ckpt = str(tmp_path / "ckpt")
        cfg = tiny_config("joint", save_every=4, eval_every=0, log_every=2,
                          eval_image_every=2, checkpoint_dir=ckpt)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, max_steps=4))
        run_train(cfg)
        best_path = os.path.join(ckpt, "ckpt_best.msgpack")
        assert os.path.exists(best_path)
        # pretend the original run's best is unbeatable
        mpath = os.path.join(ckpt, "manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        manifest["best_psnr_image"] = 999.0
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        before = os.path.getmtime(best_path)

        cfg2 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, max_steps=8))
        run_train(cfg2, resume=True)
        assert os.path.getmtime(best_path) == before, \
            "resume overwrote ckpt_best with a worse checkpoint"

    def test_keep_prunes(self, tmp_path):
        import os
        cfg = tiny_config("joint")
        state, _ = _run_steps(cfg, 1)
        for fake_step in [1, 2, 3, 4]:
            state = state._replace(step=jnp.asarray(fake_step))
            save_checkpoint(str(tmp_path), state, keep=2)
        files = [f for f in os.listdir(tmp_path) if f.startswith("ckpt_")]
        assert len(files) == 2


class TestTrainerEval:
    """Full-trainer behaviors: eval fallback warning, best-ckpt retention."""

    def _make_train_only_blender(self, base):
        """A blender scene dir with ONLY a train split (no transforms_test)."""
        import json as _json
        import os

        from PIL import Image

        os.makedirs(os.path.join(base, "train"), exist_ok=True)
        frames = []
        for i in range(2):
            img = np.full((8, 8, 4), 255, np.uint8)
            Image.fromarray(img).save(os.path.join(base, "train", f"r_{i}.png"))
            c2w = np.eye(4)
            c2w[2, 3] = 4.0
            frames.append({"file_path": f"train/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(base, "transforms_train.json"), "w") as f:
            _json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    def test_missing_test_split_warns_not_silent(self, tmp_path):
        """trainer.py eval fallback: a missing test split must WARN, never
        silently score the train split (VERDICT.md round-2 weak #3)."""
        from mipnerf360_tpu.config import get_config
        from mipnerf360_tpu.train.trainer import train

        scene = str(tmp_path / "scene")
        self._make_train_only_blender(scene)
        cfg = get_config(
            model=dict(num_samples=8, hidden_proposal=16, hidden_nerf=16,
                       nerf_depth=2, compute_dtype="float32"),
            train=dict(max_steps=2, batch_size=8, log_every=1, eval_every=0,
                       save_every=0,
                       checkpoint_dir=str(tmp_path / "ckpt")),
            data=dict(dataset="blender", base_dir=scene, factor=1),
            mesh=dict(data=1, model=1),
        )
        with pytest.warns(RuntimeWarning, match="TRAIN split"):
            train(cfg)

    def test_keep_best_saves_best_checkpoint(self, tmp_path):
        """keep_best writes ckpt_best.msgpack at image-eval boundaries and
        restore_checkpoint(step="best") loads it; manifest records the
        best mean PSNR alongside latest_step."""
        import json as _json
        import os

        from mipnerf360_tpu.train.trainer import train

        ckpt = str(tmp_path / "ckpt")
        cfg = tiny_config("joint", log_every=2, eval_every=0, save_every=0,
                          eval_image_every=2, checkpoint_dir=ckpt)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, max_steps=4))
        train(cfg)
        assert os.path.exists(os.path.join(ckpt, "ckpt_best.msgpack"))
        with open(os.path.join(ckpt, "manifest.json")) as f:
            manifest = _json.load(f)
        assert "best_psnr_image" in manifest and "best_step" in manifest
        assert manifest["latest_step"] == 4

        template = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        best = restore_checkpoint(ckpt, template, step="best")
        assert int(best.step) == manifest["best_step"]
        # best is never pruned by numeric keep
        latest = restore_checkpoint(ckpt, template)
        assert int(latest.step) == 4


class TestStaging:
    """r5 staging rework: HBM-resident device bank + index-only staging, and
    the background staging thread — both must be invisible to training
    results (the index stream is stateless; gather commutes with upload)."""

    def test_index_stack_matches_batch_stack(self):
        ds = get_dataset(tiny_config().data, "train")
        idx = ds.index_stack(3, 16, seed=7, start_step=5)
        assert idx.shape == (3, 16) and idx.dtype == np.int32
        rays, pix = ds.batch_stack(3, 16, seed=7, start_step=5)
        np.testing.assert_array_equal(ds.pixels[idx], pix)
        for bank_leaf, leaf in zip(list(ds.rays), list(rays)):
            np.testing.assert_array_equal(bank_leaf[idx], leaf)

    def test_index_stack_local_shards_reassemble(self):
        ds = get_dataset(tiny_config().data, "train")
        full = ds.index_stack(2, 8, seed=3, start_step=11)
        shards = [ds.index_stack_local(2, 8, 3, 11, p, 4) for p in range(4)]
        np.testing.assert_array_equal(np.concatenate(shards, axis=1), full)

    def test_banked_loop_matches_host_loop(self):
        from mipnerf360_tpu.parallel.mesh import (shard_batch_stack,
                                                  shard_index_stack,
                                                  upload_bank)
        from mipnerf360_tpu.train.step import make_banked_train_loop

        cfg = tiny_config()
        mesh = make_mesh(1, 1)
        ds = get_dataset(cfg.data, "train")
        state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        state = state._replace(params=shard_params(mesh, state.params))
        K, B = 4, cfg.train.batch_size
        r, p = ds.batch_stack(K, B, cfg.train.seed, 0)
        s_host, aux_h = make_train_loop(cfg, mesh, donate=False)(
            state, *shard_batch_stack(mesh, r, p))
        bank = upload_bank(mesh, ds.rays, ds.pixels)
        idx = shard_index_stack(mesh, ds.index_stack(K, B, cfg.train.seed, 0))
        s_bank, aux_b = make_banked_train_loop(cfg, mesh, donate=False)(
            state, *bank, idx)
        np.testing.assert_allclose(np.asarray(aux_h["loss"]),
                                   np.asarray(aux_b["loss"]), atol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6),
            s_host.params, s_bank.params)

    def test_trainer_stage_modes_equivalent(self, tmp_path):
        from mipnerf360_tpu.train.trainer import train

        results = {}
        for mode, async_ in (("host", False), ("device_bank", True)):
            cfg = tiny_config()
            cfg = dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, max_steps=6, log_every=3, save_every=0,
                eval_every=0, stage_mode=mode, async_staging=async_,
                checkpoint_dir=str(tmp_path / mode)))
            results[mode] = jax.device_get(train(cfg).params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            results["host"], results["device_bank"])

    def test_background_stager_order_and_errors(self):
        from mipnerf360_tpu.train.trainer import BackgroundStager, chunk_starts

        starts = list(chunk_starts(7, 50, 10))
        assert starts == [7, 10, 20, 30, 40]
        stager = BackgroundStager(lambda s: s * 2, starts, depth=2)
        got = []
        while True:
            item = stager.get()
            if item is None:
                break
            got.append(item)
        assert got == [s * 2 for s in starts]
        stager.close()

        def boom(s):
            raise RuntimeError("stage failed")

        stager = BackgroundStager(boom, [1], depth=2)
        with pytest.raises(RuntimeError, match="stage failed"):
            stager.get()
        stager.close()

    def test_background_stager_warm_prefills_queue(self):
        from mipnerf360_tpu.train.trainer import BackgroundStager

        stager = BackgroundStager(lambda s: s, range(5), depth=2)
        stager.warm(timeout=10.0)
        # Queue full = the bench timing window opens in steady state.
        assert stager._q.qsize() == 2
        for want in range(5):
            assert stager.get() == want
        assert stager.get() is None
        stager.close()

        # warm() must not deadlock when the stream is shorter than the queue.
        short = BackgroundStager(lambda s: s, [0], depth=2)
        short.warm(timeout=10.0)
        assert short.get() == 0
        short.close()

    def test_chunk_len_is_the_chunk_starts_step(self):
        # chunk_len is the single source of truth shared by the stager's
        # schedule (chunk_starts) and the consumer (trainer.stage): the
        # difference between consecutive starts must equal chunk_len at the
        # earlier start, or async staging would desync the ray counter.
        from mipnerf360_tpu.train.trainer import chunk_len, chunk_starts

        for start, max_steps, chunk in [(7, 50, 10), (0, 9, 4), (3, 4, 8)]:
            starts = list(chunk_starts(start, max_steps, chunk)) + [max_steps]
            for a, b in zip(starts, starts[1:]):
                assert b - a == chunk_len(a, max_steps, chunk)

    def test_use_device_bank_resolution(self):
        from mipnerf360_tpu.train import trainer as tr

        cfg = tiny_config()
        ds = get_dataset(cfg.data, "train")
        assert tr.use_device_bank(cfg, ds)  # tiny bank under the auto budget

        def with_mode(mode):
            return dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, stage_mode=mode))

        assert not tr.use_device_bank(with_mode("host"), ds)
        assert tr.use_device_bank(with_mode("device_bank"), ds)
        old = tr._BANK_AUTO_BYTES
        try:
            tr._BANK_AUTO_BYTES = 10  # bank no longer "fits"
            assert not tr.use_device_bank(cfg, ds)
            assert tr.use_device_bank(with_mode("device_bank"), ds)  # forced
        finally:
            tr._BANK_AUTO_BYTES = old


def test_reference_cadence_rejects_zero_prop_inner_steps():
    # The 2+1 cadence with no proposal inner steps used to crash with a bare
    # IndexError on prop_losses[-1] at trace time (r5 review).
    cfg = tiny_config("reference", prop_inner_steps=0)
    with pytest.raises(ValueError, match="prop_inner_steps"):
        _run_steps(cfg, 1)
