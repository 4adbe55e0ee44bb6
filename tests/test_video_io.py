"""MJPEG-AVI writer/reader roundtrip (utils/video_io.py) — the playable-video
fallback for ffmpeg-less environments (apps/video.py:_write_video)."""
import struct

import numpy as np

from mipnerf360_tpu.utils.video_io import read_mjpeg_avi, write_mjpeg_avi


def _gradient_frames(n=5, h=32, w=48):
    frames = []
    for i in range(n):
        y = np.broadcast_to(np.linspace(0, 1, h)[:, None], (h, w))
        x = np.broadcast_to(np.linspace(0, 1, w)[None, :], (h, w))
        img = np.stack([np.full((h, w), i / n), y, x], -1)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return frames


def test_roundtrip_decodes_every_frame(tmp_path):
    frames = _gradient_frames()
    path = str(tmp_path / "v.avi")
    write_mjpeg_avi(path, frames, fps=24)
    back = read_mjpeg_avi(path)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert b.shape == a.shape
        # JPEG q92 on smooth gradients: small lossy error only
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 3.0


def test_container_structure(tmp_path):
    frames = _gradient_frames(n=3)
    path = str(tmp_path / "v.avi")
    write_mjpeg_avi(path, frames, fps=30)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    # RIFF size field covers the rest of the file exactly
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"hdrl" in data[:200] and b"movi" in data and b"idx1" in data
    # idx1 has one 16-byte entry per frame
    i = data.index(b"idx1")
    idx_size = struct.unpack("<I", data[i + 4:i + 8])[0]
    assert idx_size == 16 * len(frames)


def test_video_app_fallback_writes_playable_avi(tmp_path, monkeypatch):
    """_write_video must fall through mp4 -> MJPEG AVI when imageio can't
    encode (the situation in this image)."""
    import sys
    import types

    from mipnerf360_tpu.apps import video as video_app

    broken = types.ModuleType("imageio")

    def _raise(*a, **k):
        raise RuntimeError("no ffmpeg")

    broken.mimwrite = _raise
    monkeypatch.setitem(sys.modules, "imageio", broken)
    out = str(tmp_path / "video.mp4")
    video_app._write_video(out, _gradient_frames(n=2))
    avi = str(tmp_path / "video.avi")
    assert len(read_mjpeg_avi(avi)) == 2
