"""Measure the PyTorch reference's training throughput (rays/s).

The reference publishes no benchmark numbers (BASELINE.md), so we measure its
training step directly: imports the reference modules read-only from
/root/reference, builds its default config operating point (batch=64 rays,
64 samples/ray, 2 proposal updates + 1 nerf update per step — config.py:41,20,
train.py:51-82) on synthetic rays, and times full steps including backward and
optimizer updates.

Run on the best available torch device (CUDA if present, else CPU) and record
the result + methodology in BASELINE_MEASURED.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from intern.loss import Loss_dist, Loss_nerf, Loss_prop
    from intern.ray import Rays
    from intern.scheduler import lr_decay
    from model import mipNeRF360

    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    model = mipNeRF360(randomized=True, num_samples=args.num_samples,
                       device=device)
    model.train()
    optimizer = torch.optim.AdamW(model.parameters(), lr=2e-3, weight_decay=1e-5)
    scheduler = lr_decay(optimizer, lr_init=2e-3, lr_final=2e-5,
                         max_steps=200_000, lr_delay_steps=2500,
                         lr_delay_mult=0.1)

    rng = np.random.default_rng(0)
    B = args.batch
    d = rng.normal(size=(B, 3)).astype(np.float32)
    rays = Rays(
        origins=torch.tensor(rng.normal(scale=0.1, size=(B, 3)).astype(np.float32), device=device),
        directions=torch.tensor(d, device=device),
        viewdirs=torch.tensor(d / np.linalg.norm(d, axis=-1, keepdims=True), device=device),
        radii=torch.full((B, 1), 5e-4, device=device),
        near=torch.full((B, 1), 2.0, device=device),
        far=torch.full((B, 1), 6.0, device=device),
    )
    pixels = torch.rand((B, 3), device=device)

    def one_step():
        # faithful reproduction of train.py:51-82
        for _ in range(2):
            t_hat, w_hat = model.prop_net.forward(rays)
            _, _, _, t, w, _ = model.nerf_net.forward(rays, t_vals=t_hat,
                                                      coarse_weights=w_hat)
            loss_prop = Loss_prop(t=t.detach(), w=w.detach(), t_hat=t_hat,
                                  w_hat=w_hat)
            optimizer.zero_grad()
            loss_prop.backward()
            optimizer.step()
            scheduler.step()
        t_hat, w_hat = model.prop_net.forward(rays)
        final_rgbs, _, _, _, fine_weights, s_vals = model.nerf_net.forward(
            rays, t_vals=t_hat.detach(), coarse_weights=w_hat.detach())
        loss_nerf, _ = Loss_nerf(input=final_rgbs, target=pixels)
        loss_dist = Loss_dist(s_vals=s_vals, weights=fine_weights)
        loss_all = loss_nerf + 0.01 * loss_dist
        optimizer.zero_grad()
        loss_all.backward()
        optimizer.step()
        scheduler.step()

    for _ in range(args.warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        one_step()
    if device.type == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0

    sec_per_step = dt / args.steps
    rays_per_sec = args.batch / sec_per_step
    result = {
        "reference_train_rays_per_sec": round(rays_per_sec, 2),
        "reference_sec_per_step": round(sec_per_step, 3),
        "device": str(device),
        "torch_threads": torch.get_num_threads(),
        "batch": args.batch,
        "num_samples": args.num_samples,
        "steps_timed": args.steps,
        "methodology": (
            "zhangkai0425/mipnerf360 train step (2 prop updates + 1 nerf "
            "update, batch=64 rays, 64 samples/ray — its default operating "
            "point) timed on synthetic rays, including backward + optimizer. "
            "Reference targets an RTX 3090 (README.md:19) but no GPU is "
            "available in this environment; the measured device is recorded "
            "above. The dominant costs are its Python hot loops "
            "(per-sample autograd Jacobians, O(N^2) distortion loop), which "
            "are device-independent Python overhead."),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
