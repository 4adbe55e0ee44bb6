"""CLI smoke tests: train -> eval -> video through the real app mains on the
dataset-free synthetic scene (CPU). Guards the argparse/config-resolution/
checkpoint-autoload plumbing the end-to-end drive otherwise only exercises
manually on hardware."""
import os
import sys

import pytest


SETS = [
    "model.num_samples=8", "model.hidden_proposal=16", "model.hidden_nerf=16",
    "model.nerf_depth=2", "model.compute_dtype=float32",
    "data.dataset=synthetic", "data.synthetic_resolution=8",
    "data.synthetic_views=2",
]


def _argv(module_args):
    return ["prog"] + [a for s in module_args for a in ("--set", s)]


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from mipnerf360_tpu.apps import train as train_app

    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    argv = _argv(SETS + [
        "train.max_steps=4", "train.batch_size=8", "train.log_every=2",
        "train.save_every=0", "train.eval_every=0",
        f"train.checkpoint_dir={ckpt}",
    ])
    old = sys.argv
    sys.argv = argv
    try:
        train_app.main()
    finally:
        sys.argv = old
    assert os.path.exists(os.path.join(ckpt, "config.json"))
    return ckpt


def test_eval_app_writes_images_and_psnr(trained_ckpt, capsys):
    from mipnerf360_tpu.apps import eval as eval_app

    out = str(trained_ckpt) + "_eval"
    old = sys.argv
    sys.argv = ["prog", "--ckpt", trained_ckpt, "--out", out,
                "--chunk", "64", "--depth", "--normals"]
    try:
        eval_app.main()
    finally:
        sys.argv = old
    printed = capsys.readouterr().out
    assert "mean PSNR" in printed
    files = os.listdir(out)
    assert any(f.startswith("rgb_") for f in files)
    assert any(f.startswith("dist_") for f in files)
    assert any(f.startswith("norm_") for f in files)


def test_video_app_writes_frames(trained_ckpt):
    from mipnerf360_tpu.apps import video as video_app

    out = str(trained_ckpt) + "_video"
    old = sys.argv
    sys.argv = ["prog", "--ckpt", trained_ckpt, "--out", out, "--chunk", "64"]
    try:
        video_app.main()
    finally:
        sys.argv = old
    # mp4 when ffmpeg exists, PNG frame dir otherwise — either counts.
    has_mp4 = os.path.exists(os.path.join(out, "video.mp4"))
    frames = os.path.join(out, "video.mp4.frames")
    has_frames = os.path.isdir(frames) and len(os.listdir(frames)) > 0
    assert has_mp4 or has_frames


def test_eval_app_config_autoload_matches_train(trained_ckpt):
    """eval must reconstruct the model from the ckpt's config.json without
    any --set model.* flags (restore would fail on a shape mismatch)."""
    import json

    with open(os.path.join(trained_ckpt, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["model"]["hidden_nerf"] == 16  # non-default survived the trip
