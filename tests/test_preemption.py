"""Preemption flush (SURVEY.md §5 failure detection): SIGTERM mid-train must
write a checkpoint at the next chunk boundary and exit cleanly."""
import os
import signal
import subprocess
import sys
import time

import pytest

from mipnerf360_tpu.train.checkpoint import latest_checkpoint_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigterm_flushes_checkpoint(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "mipnerf360_tpu.apps.train",
         "--set", "model.num_samples=8", "--set", "model.hidden_proposal=16",
         "--set", "model.hidden_nerf=16", "--set", "model.nerf_depth=2",
         "--set", "model.compute_dtype=float32",
         "--set", "train.max_steps=100000", "--set", "train.batch_size=16",
         "--set", "train.log_every=5", "--set", "train.save_every=0",
         "--set", "train.eval_every=0",
         "--set", f"train.checkpoint_dir={ckpt}",
         "--set", "data.dataset=synthetic",
         "--set", "data.synthetic_resolution=8",
         "--set", "data.synthetic_views=2"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        # Wait until training has made progress (metrics file appears).
        metrics = os.path.join(ckpt, "metrics.jsonl")
        deadline = time.time() + 900  # generous: CPU compile on a contended host
        while time.time() < deadline:
            if os.path.exists(metrics) and os.path.getsize(metrics) > 0:
                break
            if proc.poll() is not None:
                pytest.fail(f"train exited early:\n{proc.stdout.read()}")
            time.sleep(0.5)
        else:
            pytest.fail("train never reached the first log boundary")

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    assert proc.returncode == 0, out
    step = latest_checkpoint_step(ckpt)
    assert step is not None and step > 0, out
    assert "preempted" in out, out
