#!/usr/bin/env python
"""Supplementary perceptual metric for the guidance ablation
(tools/run_ablation.py): LPIPS-style VGG feature distance over the held-out
eval renders, full-image and restricted to the inpaint-mask bounding box.

HONEST LABELING: without real VGG16 weights this uses the random-init VGG
feature net (utils/lpips.py fallback) — a *proxy* perceptual distance
(random-feature distances still correlate with patch-level structure), NOT
the paper's LPIPS. Pass --vgg_npz (tools/convert_vgg.py output) to compute
the real metric when weights exist.

Usage: python tools/ablation_lpips.py /tmp/ablation [--vgg_npz path]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="ablation dir (run_ablation.py output)")
    ap.add_argument("--vgg_npz", default=None)
    args = ap.parse_args()

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from gbnerf_tpu.utils.lpips import LPIPS, load_vgg16_npz

    weights = load_vgg16_npz(args.vgg_npz) if args.vgg_npz else None
    lp = LPIPS(jax.random.PRNGKey(0), weights=weights)
    tag = "lpips" if args.vgg_npz else "lpips_proxy(random-VGG)"

    scene = os.path.join(args.out, "scene")
    gtdir = glob.glob(os.path.join(scene, "images_*", "test_gt"))[0]
    gts = sorted(f for f in glob.glob(os.path.join(gtdir, "*.png"))
                 if "mask" not in os.path.basename(f))
    masks = sorted(glob.glob(os.path.join(gtdir, "mask*.png")))
    gt = np.stack([imageio.imread(f)[..., :3] / 255.0 for f in gts])
    mk = np.stack([imageio.imread(f) for f in masks]).astype(np.float32)
    mk = mk / max(mk.max(), 1.0)

    results = {}
    for armdir in sorted(glob.glob(os.path.join(args.out, "logs", "*"))):
        arm = os.path.basename(armdir)
        evals = sorted(glob.glob(os.path.join(armdir, "eval_images_*")),
                       key=lambda p: int(p.rsplit("_", 1)[1]))
        if not evals:
            continue
        rgbdir = os.path.join(evals[-1], "rgb")
        preds = sorted(glob.glob(os.path.join(rgbdir, "[0-9]*.png")))[:len(gt)]
        pred = np.stack([imageio.imread(f)[..., :3] / 255.0 for f in preds])
        full = float(np.mean(np.asarray(
            lp(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))))
        # mask-bbox crop (shared across views, padded to >=32px for the
        # 4-maxpool VGG pyramid)
        ys, xs = np.where(mk.max(0) > 0.5)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        H, W = mk.shape[1:]
        while (y1 - y0) < 32:
            y0, y1 = max(0, y0 - 1), min(H, y1 + 1)
        while (x1 - x0) < 32:
            x0, x1 = max(0, x0 - 1), min(W, x1 + 1)
        crop = lambda a: a[:, y0:y1, x0:x1]
        masked = float(np.mean(np.asarray(
            lp(jnp.asarray(crop(pred), jnp.float32),
               jnp.asarray(crop(gt), jnp.float32)))))
        results[arm] = {"full": round(full, 5), "mask_bbox": round(masked, 5)}
        print(f"{arm:6s} {tag}: full={full:.5f} mask_bbox={masked:.5f}")

    with open(os.path.join(args.out, "ablation_lpips.json"), "w") as f:
        json.dump({"metric": tag, "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
