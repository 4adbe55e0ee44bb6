"""Scaling-efficiency harness -> SCALING_r4.json (override with --out).

BASELINE.md targets >=85% iter/s scaling efficiency from 1 host to 2 hosts.
No multi-chip or multi-host TPU hardware exists in this environment (one
tunneled v5e chip), so this harness measures the two quantities that ARE
measurable here, both on CPU with virtual devices — and documents the
methodology to reproduce the real number on a pod:

1. **Virtual-mesh sharding overhead** (single process): the SAME total ray
   batch and the same physical cores, dp mesh widened 1 -> 2 -> 4 -> 8.
   Total work is constant, so throughput(n)/throughput(1) isolates the cost
   that sharding adds — GSPMD partitioning, per-shard dispatch, and the
   gradient-psum collectives that would ride ICI on real chips. This is an
   overhead measurement, NOT a speedup measurement (virtual devices share
   cores; real chips would each bring their own FLOPs).

2. **Loopback multi-process overhead** (the 1->2 "host" stand-in): the same
   global 4-device mesh and global batch, run as 1 process x 4 devices vs
   2 coordinator-connected processes x 2 devices. The delta isolates the
   cross-process collective path (gRPC here; DCN on a real pod).

On real hardware the same worker runs unchanged: per-host
`python tools/_scaling_worker.py --devices <chips/host> --nproc <hosts>
--pid <i> --port <coord>` with JAX_PLATFORMS=tpu, and efficiency =
steps/s(2 hosts, 2x global batch) / steps/s(1 host).

Usage: python tools/scaling.py [--batch 2048] [--steps 20]
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "_scaling_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    return env


def run_single(devices: int, batch: int, steps: int, reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, WORKER, "--devices", str(devices),
         "--batch", str(batch), "--steps", str(steps), "--reps", str(reps)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout + out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_multiproc(nproc: int, devices_per_proc: int, batch: int,
                  steps: int, reps: int) -> dict:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--devices", str(devices_per_proc),
             "--nproc", str(nproc), "--pid", str(pid), "--port", str(port),
             "--batch", str(batch), "--steps", str(steps),
             "--reps", str(reps)],
            cwd=REPO, env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid={pid}:\n{out}"
    return json.loads(outs[0].strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="SCALING_r4.json")
    args = ap.parse_args()

    mesh_rows = []
    base = None
    for n in [1, 2, 4, 8]:
        r = run_single(n, args.batch, args.steps, args.reps)
        if base is None:
            base = r["steps_per_sec"]
        r["throughput_ratio_vs_1"] = round(r["steps_per_sec"] / base, 4)
        mesh_rows.append(r)
        print(f"virtual mesh n={n}: {r}", flush=True)

    one_proc = run_single(4, args.batch, args.steps, args.reps)
    two_proc = run_multiproc(2, 2, args.batch, args.steps, args.reps)
    loopback_eff = round(two_proc["steps_per_sec"]
                         / one_proc["steps_per_sec"], 4)
    # conservative spread from the per-rep extremes of both sides
    eff_lo = round(min(two_proc["steps_per_sec_reps"])
                   / max(one_proc["steps_per_sec_reps"]), 4)
    eff_hi = round(max(two_proc["steps_per_sec_reps"])
                   / min(one_proc["steps_per_sec_reps"]), 4)
    print(f"loopback: 1x4dev {one_proc['steps_per_sec']} steps/s, "
          f"2x2dev {two_proc['steps_per_sec']} steps/s, "
          f"eff {loopback_eff} [{eff_lo}, {eff_hi}]", flush=True)

    noise = any(r["throughput_ratio_vs_1"] > 1.0 for r in mesh_rows[1:])
    result = {
        "what": ("Scaling-overhead measurements on CPU virtual devices — "
                 "the only scaling surface available (single tunneled TPU "
                 "chip, no pod). See module docstring for the real-pod "
                 "methodology; the >=85% BASELINE.md target applies to "
                 "that measurement."),
        "headline": {
            "metric": "loopback 2-process efficiency (the 1->2 host stand-in)",
            "efficiency_2proc_vs_1proc": loopback_eff,
            "spread_from_rep_extremes": [eff_lo, eff_hi],
            "reps": args.reps,
        },
        "host": {"physical_cores": os.cpu_count()},
        "config": {"batch_total": args.batch, "steps_per_chunk": args.steps,
                   "reps": args.reps,
                   "model": "num_samples=32 prop64 nerf256x4 f32 joint"},
        "virtual_mesh_rows": {
            "note": ("COMPILE-CORRECTNESS ONLY, not an efficiency signal: "
                     f"{os.cpu_count()} physical cores execute all virtual "
                     "devices, so row-to-row spread exceeds the sharding "
                     "overhead being probed (ratios > 1.0 are noise"
                     + (", present in this run" if noise else "")
                     + "). Kept to show the dp-sharded program compiles and "
                     "runs at every width with mean±std recorded."),
            "rows": mesh_rows,
        },
        "loopback_process_overhead": {
            "note": ("same global 4-device mesh + batch: 1 process x 4 dev "
                     "vs 2 coordinator-connected processes x 2 dev; the "
                     "delta is the cross-process collective path (gRPC "
                     "stand-in for DCN)"),
            "one_process": one_proc,
            "two_process": two_proc,
            "efficiency_2proc_vs_1proc": loopback_eff,
        },
    }
    out_path = os.path.join(REPO, args.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
