"""Config system tests: presets, serialization, CLI overrides."""
import argparse

import pytest

from mipnerf360_tpu.config import Config, PRESETS, get_config
from mipnerf360_tpu.apps.common import add_config_args, apply_overrides, config_from_args


class TestPresets:
    def test_all_presets_construct(self):
        for name, fn in PRESETS.items():
            cfg = fn()
            assert cfg.preset == name
            assert cfg.model.num_samples > 0

    def test_baseline_configs_covered(self):
        # BASELINE.json's five benchmark configs
        for name in ["tiny_lego", "blender_lego", "llff_fern", "garden",
                     "bicycle_multihost"]:
            assert name in PRESETS

    def test_llff_uses_cylinder_and_no_white_bkgd(self):
        cfg = get_config("llff_fern")
        assert cfg.model.ray_shape == "cylinder"
        assert cfg.model.white_bkgd is False
        assert cfg.data.factor == 8  # reference config.py:64-68 llff override

    def test_blender_uses_white_bkgd(self):
        assert get_config("blender_lego").model.white_bkgd is True

    def test_quality_presets_resolve_to_proven_values(self):
        # The exact field values the convergence run (PARITY_PSNR.json
        # "convergence" / tools/parity_psnr.py quality=True) proved converge
        # — VERDICT.md round-2 item 1: the shipping presets must carry them.
        for name in ["garden_quality", "synthetic_quality",
                     "blender_lego_quality", "llff_fern_quality"]:
            cfg = get_config(name)
            assert cfg.model.density_head_sigmoid is False
            assert cfg.model.trunk_final_sigmoid is False
            assert cfg.model.ipe_max_deg == 5
            assert cfg.model.density_bias == -5.0
            assert cfg.train.lr_delay_mult == 0.01
            # best-eval checkpoint retention is on so demo_360.sh's
            # `--step best` works
            assert cfg.train.keep_best and cfg.train.eval_image_every > 0

    def test_quality_preset_matches_quality_constants(self):
        from mipnerf360_tpu.config import QUALITY_MODEL, QUALITY_TRAIN

        cfg = get_config("garden_quality")
        for k, v in QUALITY_MODEL.items():
            assert getattr(cfg.model, k) == v, k
        for k, v in QUALITY_TRAIN.items():
            assert getattr(cfg.train, k) == v, k

    def test_quality_input_dim(self):
        # multi-scale IPE deg 5: 42*5 + 16 = 226
        assert get_config("synthetic_quality").model.input_dim == 226

    def test_ndc_free_fern_presets(self):
        # BASELINE configs[2]: NDC-free contract() fern, parity + quality
        for name in ["llff_fern_contract", "llff_fern_quality"]:
            cfg = get_config(name)
            assert cfg.data.use_ndc is False
            assert cfg.data.dataset == "llff" and cfg.data.scene == "fern"
        assert get_config("llff_fern").data.use_ndc is True  # reference parity
        assert get_config("blender_lego_quality").model.white_bkgd is True


class TestSerialization:
    def test_json_roundtrip(self):
        cfg = get_config("garden")
        cfg2 = Config.from_json(cfg.to_json())
        assert cfg2 == cfg

    def test_default_input_dim(self):
        assert Config().model.input_dim == 58


def _args(sets, preset=""):
    ap = argparse.ArgumentParser()
    add_config_args(ap)
    return ap.parse_args(
        ([] if not preset else ["--preset", preset]) +
        [x for kv in sets for x in ("--set", kv)])


class TestOverrides:
    def test_basic_override(self):
        cfg = config_from_args(_args(["train.batch_size=512"]))
        assert cfg.train.batch_size == 512

    def test_bool_override(self):
        cfg = config_from_args(_args(["model.white_bkgd=true",
                                      "model.remat=0"]))
        assert cfg.model.white_bkgd is True
        assert cfg.model.remat is False

    def test_preset_plus_override(self):
        cfg = config_from_args(_args(["data.factor=4"], preset="garden"))
        assert cfg.preset == "garden"
        assert cfg.data.factor == 4

    def test_unknown_field_fails_with_listing(self):
        with pytest.raises(SystemExit, match="unknown field"):
            apply_overrides(Config(), ["model.nope=1"])

    def test_unknown_group_fails(self):
        with pytest.raises(SystemExit, match="unknown group"):
            apply_overrides(Config(), ["nope.x=1"])

    def test_unparsable_value_fails(self):
        with pytest.raises(SystemExit, match="cannot parse"):
            apply_overrides(Config(), ["train.batch_size=abc"])

    def test_missing_equals_fails(self):
        with pytest.raises(SystemExit, match="expected K=V"):
            apply_overrides(Config(), ["train.batch_size"])

    def test_ckpt_config_autoload(self, tmp_path):
        cfg = get_config("tiny_lego")
        with open(tmp_path / "config.json", "w") as f:
            f.write(cfg.to_json())
        loaded = config_from_args(_args(["train.batch_size=99"]),
                                  ckpt_dir=str(tmp_path))
        assert loaded.preset == "tiny_lego"
        assert loaded.train.batch_size == 99
        assert loaded.model.hidden_nerf == cfg.model.hidden_nerf

    def test_ckpt_config_authoritative_over_matching_preset(self, tmp_path):
        """`--resume --preset X` (the documented flow): the SAVED config —
        including its original model.* overrides — must survive, not be
        replaced by a freshly-built preset (advisor r3 medium: the old code
        discarded the saved config whenever --preset was given, dropping
        e.g. a changed trunk depth -> restore shape-mismatch crash)."""
        cfg = apply_overrides(get_config("tiny_lego"),
                              ["model.nerf_depth=2", "model.density_bias=-3.0"])
        with open(tmp_path / "config.json", "w") as f:
            f.write(cfg.to_json())
        loaded = config_from_args(_args([], preset="tiny_lego"),
                                  ckpt_dir=str(tmp_path))
        assert loaded.model.nerf_depth == 2          # shape-bearing override
        assert loaded.model.density_bias == -3.0     # silent-divergence field

    def test_ckpt_config_conflicting_preset_rejected(self, tmp_path):
        with open(tmp_path / "config.json", "w") as f:
            f.write(get_config("tiny_lego").to_json())
        with pytest.raises(SystemExit, match="conflicts with the checkpoint"):
            config_from_args(_args([], preset="garden"), ckpt_dir=str(tmp_path))


class TestBoolOverrides:
    def test_typod_bool_rejected_not_silently_false(self):
        # r5 review: "ture" used to coerce to False with no diagnostic.
        with pytest.raises(SystemExit, match="cannot parse"):
            apply_overrides(Config(), ["train.keep_best=ture"])

    def test_bool_spellings(self):
        assert apply_overrides(
            Config(), ["data.use_ndc=false"]).data.use_ndc is False
        assert apply_overrides(
            Config(), ["data.use_ndc=0"]).data.use_ndc is False
        assert apply_overrides(
            Config(), ["train.keep_best=YES"]).train.keep_best is True
