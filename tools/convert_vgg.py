#!/usr/bin/env python
"""Convert torchvision VGG16 weights (+ optional lpips-package linear heads)
to the npz layout `utils/lpips.load_vgg16_npz` expects.

The reference computes LPIPS through the `lpips` pip package
(/root/reference/run.py:710-714); this environment has no network, so when a
user drops the checkpoints locally:

    torchvision vgg16:   features.{i}.weight/bias (conv indices
                         0,2,5,7,10,12,14,17,19,21,24,26,28)
    lpips vgg heads:     lin{k}.model.1.weight [1, C, 1, 1], k = 0..4

this tool produces one npz with conv_{j}/kernel (HWIO), conv_{j}/bias and
flat lin_{k} per-channel vectors. Normalization parity: the lpips package's
shift/scale on [-1,1] inputs is algebraically identical to the ImageNet
mean/std on [0,1] inputs our VGG16Features applies
((1+shift)/2 = mean, scale/2 = std).

Usage:
  python tools/convert_vgg.py vgg16.pth out.npz [--lpips lpips_vgg.pth]
"""
from __future__ import annotations

import argparse

import numpy as np

# torchvision VGG16 `features` indices of the 13 conv layers, in order
TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def load_torch_sd(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v) for k, v in load_file(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.float().numpy() for k, v in sd.items()}


def convert(vgg_sd: dict, lpips_sd: dict | None = None) -> dict:
    out = {}
    for j, idx in enumerate(TORCH_CONV_IDX):
        w = vgg_sd[f"features.{idx}.weight"]          # OIHW
        b = vgg_sd[f"features.{idx}.bias"]
        out[f"conv_{j}/kernel"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        out[f"conv_{j}/bias"] = b.astype(np.float32)
    if lpips_sd is not None:
        for k in range(5):
            key = next(k2 for k2 in (f"lin{k}.model.1.weight",
                                     f"lins.{k}.model.1.weight")
                       if k2 in lpips_sd)
            out[f"lin_{k}"] = lpips_sd[key].reshape(-1).astype(np.float32)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("vgg", help="torchvision vgg16 state dict (.pth)")
    ap.add_argument("out", help="output npz")
    ap.add_argument("--lpips", help="lpips package vgg.pth (linear heads)")
    args = ap.parse_args()

    vgg_sd = load_torch_sd(args.vgg)
    lpips_sd = load_torch_sd(args.lpips) if args.lpips else None
    out = convert(vgg_sd, lpips_sd)
    np.savez(args.out, **out)
    lins = "with" if lpips_sd else "without"
    print(f"wrote {args.out}: {len(out)} arrays ({lins} lpips lin heads)")


if __name__ == "__main__":
    main()
