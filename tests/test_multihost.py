"""Multi-host runtime over jax.distributed loopback (SURVEY.md §4: the
distributed-test mechanism the reference lacks): 2 coordinator-connected
processes x 2 virtual CPU devices run one data-parallel train step on a
global 4-device mesh from process-local batch shards and must agree
bit-exactly on the loss and the updated params."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")
STAGING_WORKER = os.path.join(REPO, "tests", "_multihost_staging_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(worker: str, nproc: int = 2, extra_args=()):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port),
             *extra_args],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid={pid}:\n{out}"
        assert f"OK pid={pid}" in out, f"pid={pid}:\n{out}"


def test_two_process_train_step_agrees():
    _run_workers(WORKER)


def test_two_process_staging_parity():
    """The trainer's per-process staging (stage_batch with process_count > 1)
    must produce bit-identical training to full-global-stack assembly."""
    _run_workers(STAGING_WORKER)


def test_two_process_full_trainer(tmp_path):
    """The REAL trainer loop (train/trainer.py::train) end-to-end under
    2-process collectives: device-bank staging, background staging thread,
    host-0-only metrics/checkpoint writes, final checkpoint restorable."""
    ckpt = str(tmp_path / "run")
    _run_workers(os.path.join(REPO, "tests", "_multihost_trainer_worker.py"),
                 extra_args=(ckpt,))
    wrote = set(os.listdir(ckpt))
    assert "metrics.jsonl" in wrote and "config.json" in wrote, wrote
    assert any(f.startswith("ckpt_") for f in wrote), wrote
