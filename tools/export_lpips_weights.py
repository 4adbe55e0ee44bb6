"""Export pretrained LPIPS-VGG16 weights to the .npz our JAX metric loads.

Run this OUTSIDE the build environment (it needs network access /
torchvision + lpips caches, neither of which exists here — zero egress,
verified: no ~/.cache/torch, no torchvision, no lpips package):

    pip install torch torchvision lpips
    python tools/export_lpips_weights.py --out lpips_vgg.npz

Then pass the file to eval:

    python -m mipnerf360_tpu.apps.eval ... --lpips lpips_vgg.npz

Mapping: torchvision vgg16(pretrained).features conv layers (OIHW) ->
conv{i}_w as HWIO + conv{i}_b; lpips.LPIPS(net='vgg').lins[l].model[1]
1x1 conv weights [1, C, 1, 1] -> lin{l} as [C].
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import lpips as lpips_pkg  # noqa: import guarded by the docstring
    import torch

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [m for m in model.net.slice1] \
        + [m for m in model.net.slice2] \
        + [m for m in model.net.slice3] \
        + [m for m in model.net.slice4] \
        + [m for m in model.net.slice5]
    i = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            # OIHW -> HWIO
            out[f"conv{i}_w"] = (
                m.weight.detach().numpy().transpose(2, 3, 1, 0)
                .astype(np.float32))
            out[f"conv{i}_b"] = m.bias.detach().numpy().astype(np.float32)
            i += 1
    assert i == 13, f"expected 13 VGG-16 convs, found {i}"
    for l, lin in enumerate(model.lins):
        w = lin.model[1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{l}"] = w.reshape(-1).astype(np.float32)
    np.savez(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
