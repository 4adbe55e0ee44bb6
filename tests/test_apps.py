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
    # mp4 when ffmpeg exists, the MJPEG-AVI fallback otherwise (r5,
    # utils/video_io.py), PNG frame dir as the last resort.
    has_mp4 = os.path.exists(os.path.join(out, "video.mp4"))
    has_avi = os.path.exists(os.path.join(out, "video.avi"))
    frames = os.path.join(out, "video.mp4.frames")
    has_frames = os.path.isdir(frames) and len(os.listdir(frames)) > 0
    assert has_mp4 or has_avi or has_frames


def test_video_app_end_to_end_on_blender_scene(tmp_path):
    """Round-1 gap (VERDICT.md item 3): the reference renders videos from
    blender scenes via the base-class synthesized render path
    (dataset.py:75-89, video.py:12-55); get_dataset(blender, "render") must
    work and the video app must run end-to-end on a fabricated scene."""
    import json

    import numpy as np

    from mipnerf360_tpu.apps import train as train_app, video as video_app

    # fabricate a tiny blender dataset
    scene = tmp_path / "scene"
    rng = np.random.default_rng(0)
    from PIL import Image

    for split in ["train", "test"]:
        os.makedirs(scene / split, exist_ok=True)
        frames = []
        for i in range(2):
            img = rng.integers(0, 255, (8, 8, 4), dtype=np.uint8)
            Image.fromarray(img).save(scene / split / f"r_{i}.png")
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 4 + i]
            frames.append({"file_path": f"{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    ckpt = str(tmp_path / "ckpt")
    blender_sets = [
        "model.num_samples=8", "model.hidden_proposal=16",
        "model.hidden_nerf=16", "model.nerf_depth=2",
        "model.compute_dtype=float32",
        "data.dataset=blender", f"data.base_dir={scene}", "data.factor=1",
        "data.n_render_poses=2", "data.render_h=8", "data.render_w=8",
    ]
    old = sys.argv
    sys.argv = _argv(blender_sets + [
        "train.max_steps=2", "train.batch_size=8", "train.log_every=2",
        "train.save_every=0", "train.eval_every=0",
        f"train.checkpoint_dir={ckpt}"])
    try:
        train_app.main()
    finally:
        sys.argv = old

    out = str(tmp_path / "video")
    sys.argv = ["prog", "--ckpt", ckpt, "--out", out, "--chunk", "64"]
    try:
        video_app.main()
    finally:
        sys.argv = old
    has_mp4 = os.path.exists(os.path.join(out, "video.mp4"))
    avi = os.path.join(out, "video.avi")
    has_avi = False
    if os.path.exists(avi):
        from mipnerf360_tpu.utils.video_io import read_mjpeg_avi

        has_avi = len(read_mjpeg_avi(avi)) == 2
    frames_dir = os.path.join(out, "video.mp4.frames")
    has_frames = os.path.isdir(frames_dir) and len(os.listdir(frames_dir)) == 2
    assert has_mp4 or has_avi or has_frames


def test_eval_app_config_autoload_matches_train(trained_ckpt):
    """eval must reconstruct the model from the ckpt's config.json without
    any --set model.* flags (restore would fail on a shape mismatch)."""
    import json

    with open(os.path.join(trained_ckpt, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["model"]["hidden_nerf"] == 16  # non-default survived the trip


def test_eval_app_step_selection(tmp_path, capsys):
    """--step loads a specific (non-latest) checkpoint, matching the
    reference's any-step --model_weight_path loading (test.py:34)."""
    from mipnerf360_tpu.apps import eval as eval_app, train as train_app

    ckpt = str(tmp_path / "ckpt")
    old = sys.argv
    sys.argv = _argv(SETS + [
        "train.max_steps=4", "train.batch_size=8", "train.log_every=2",
        "train.save_every=2", "train.eval_every=0",
        f"train.checkpoint_dir={ckpt}"])
    try:
        train_app.main()
    finally:
        sys.argv = old
    assert os.path.exists(os.path.join(ckpt, "ckpt_2.msgpack"))
    assert os.path.exists(os.path.join(ckpt, "ckpt_4.msgpack"))

    out = str(tmp_path / "eval")
    sys.argv = ["prog", "--ckpt", ckpt, "--step", "2", "--out", out,
                "--chunk", "64"]
    try:
        eval_app.main()
    finally:
        sys.argv = old
    assert "restored step=2" in capsys.readouterr().out


def test_train_resume_autoloads_saved_config(tmp_path):
    """`--resume` with only train.* flags must rebuild the model from the
    checkpoint dir's config.json (a default-config model would fail the
    restore on a trunk-depth shape mismatch) and continue past the saved
    step."""
    from mipnerf360_tpu.apps import train as train_app

    ckpt = str(tmp_path / "ckpt")
    old = sys.argv
    sys.argv = _argv(SETS + [
        "train.max_steps=4", "train.batch_size=8", "train.log_every=2",
        "train.save_every=2", "train.eval_every=0",
        f"train.checkpoint_dir={ckpt}"])
    try:
        train_app.main()
    finally:
        sys.argv = old
    assert os.path.exists(os.path.join(ckpt, "ckpt_4.msgpack"))

    # resume: NO model.* overrides — config must come from config.json
    sys.argv = ["prog", "--resume",
                "--set", f"train.checkpoint_dir={ckpt}",
                "--set", "train.max_steps=6", "--set", "train.save_every=2",
                "--set", "train.log_every=2", "--set", "train.eval_every=0"]
    try:
        train_app.main()
    finally:
        sys.argv = old
    assert os.path.exists(os.path.join(ckpt, "ckpt_6.msgpack"))
