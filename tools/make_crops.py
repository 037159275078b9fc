"""Labeled masked-region crop strips from an ablation run directory.

Reads the held-out ground truth (`scene/images_4/test_gt/img_*.png` +
`mask_*.png`, written by tools/make_synthetic_scene.py) and each arm's final
`logs/<arm>/eval_images_<iter>/rgb/<view>.png`, crops the mask's padded
bounding box, and tiles [GT | arm1 | arm2 | ...] with labels — the visual
evidence row used in PARITY.md (docs/ablation_r*_crops*.png). Pure
numpy/PIL; picks the view with the largest mask by default.

Usage:
  python tools/make_crops.py /tmp/abl out.png --arms s1,nog,prior
  python tools/make_crops.py /tmp/abl out.png --arms ... --view 1 --pad 12
"""
import argparse
import glob
import os
import re

import numpy as np
from PIL import Image, ImageDraw


def load(path):
    return np.asarray(Image.open(path).convert("RGB"))


def final_eval_dir(logdir):
    cands = glob.glob(os.path.join(logdir, "eval_images_*"))
    if not cands:
        raise SystemExit(f"no eval_images_* under {logdir}")
    return max(cands, key=lambda p: int(re.search(r"(\d+)$", p).group(1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", help="ablation run dir (scene/ + logs/)")
    ap.add_argument("png", help="output figure path")
    ap.add_argument("--arms", required=True,
                    help="comma list, tiled left-to-right after GT")
    ap.add_argument("--view", type=int, default=None,
                    help="held-out view index (default: largest mask)")
    ap.add_argument("--pad", type=int, default=10,
                    help="bbox padding in px")
    ap.add_argument("--scale", type=int, default=4,
                    help="nearest-neighbor upscale factor")
    args = ap.parse_args()

    gt_dir = os.path.join(args.out_dir, "scene", "images_4", "test_gt")
    masks = sorted(glob.glob(os.path.join(gt_dir, "mask_*.png")))
    if not masks:
        raise SystemExit(f"no test_gt masks under {gt_dir}")
    mask_im = [np.asarray(Image.open(m).convert("L")) > 127 for m in masks]
    view = (args.view if args.view is not None
            else int(np.argmax([m.sum() for m in mask_im])))
    mask = mask_im[view]
    gt = load(os.path.join(gt_dir, f"img_{view:03d}.png"))

    ys, xs = np.nonzero(mask)
    y0 = max(0, ys.min() - args.pad)
    y1 = min(mask.shape[0], ys.max() + 1 + args.pad)
    x0 = max(0, xs.min() - args.pad)
    x1 = min(mask.shape[1], xs.max() + 1 + args.pad)

    tiles = [("GT", gt)]
    for arm in args.arms.split(","):
        d = final_eval_dir(os.path.join(args.out_dir, "logs", arm))
        tiles.append((arm, load(os.path.join(d, "rgb", f"{view:03d}.png"))))

    s, label_h, gap = args.scale, 16, 2
    ch, cw = (y1 - y0) * s, (x1 - x0) * s
    W = len(tiles) * (cw + gap) - gap
    canvas = Image.new("RGB", (W, ch + label_h), (255, 255, 255))
    draw = ImageDraw.Draw(canvas)
    for i, (name, im) in enumerate(tiles):
        crop = Image.fromarray(im[y0:y1, x0:x1]).resize(
            (cw, ch), Image.NEAREST)
        xoff = i * (cw + gap)
        canvas.paste(crop, (xoff, label_h))
        draw.text((xoff + 2, 2), name, fill=(0, 0, 0))
    canvas.save(args.png)
    print(f"wrote {args.png}  view={view} bbox=({y0}:{y1},{x0}:{x1}) "
          f"tiles={[t[0] for t in tiles]}")


if __name__ == "__main__":
    main()
