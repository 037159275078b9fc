#!/usr/bin/env python
"""Generate a tiny synthetic LLFF/SPIn-NeRF-layout dataset for smoke tests.

Writes: poses_bounds.npy, images_4/RGB_inpainted/*.png, images_4/label/*.png,
images_4/Depth_inpainted/*.png — the exact on-disk layout the reference
loader (and ours) expects. The scene is a diffuse sphere at the origin viewed
from a forward-facing arc, so renders have real parallax/depth structure.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def look_at(pos, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    z = pos - target
    z = z / np.linalg.norm(z)            # camera backward (OpenGL)
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, pos], axis=1).astype(np.float32)  # [3,4]


def render_sphere(H, W, focal, c2w, radius=0.5):
    """Analytic render: lambertian sphere at origin on sky gradient."""
    j, i = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1)
    rd = dirs @ c2w[:3, :3].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = c2w[:3, 3]
    b = 2 * rd @ ro
    c = ro @ ro - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
    pts = ro + t[..., None] * rd
    n = pts / radius
    light = np.array([0.5, 0.7, 0.5]); light /= np.linalg.norm(light)
    lam = np.clip(n @ light, 0, 1)
    albedo = np.array([0.8, 0.35, 0.25])
    sky = np.stack([0.5 + 0.3 * rd[..., 1]] * 3, -1) * np.array([0.6, 0.7, 0.9])
    img = np.where(hit[..., None], albedo * (0.2 + 0.8 * lam[..., None]), sky)
    depth = np.where(hit, t, 4.0)
    return img.astype(np.float32), depth.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n_train", type=int, default=6)
    ap.add_argument("--n_test", type=int, default=2)
    ap.add_argument("--H", type=int, default=48)
    ap.add_argument("--W", type=int, default=64)
    ap.add_argument("--factor", type=int, default=4)
    args = ap.parse_args()

    import imageio.v2 as imageio

    H, W = args.H, args.W
    focal = 1.2 * W
    n_total = args.n_test + args.n_train
    # Interleave test views INSIDE the camera arc (pose file order is still
    # test-first to match the SPIn-NeRF layout) — edge-of-arc test views
    # would measure extrapolation, not novel-view interpolation.
    test_slots = [int((i + 1) * n_total / (args.n_test + 1))
                  for i in range(args.n_test)]
    train_slots = [s for s in range(n_total) if s not in test_slots]
    slot_order = test_slots + train_slots
    rows = []
    imgs, depths = [], []
    for k in range(n_total):
        slot = slot_order[k]
        th = (slot / n_total - 0.5) * 0.9
        pos = np.array([2.5 * np.sin(th), 0.3 * np.sin(2 * th),
                        2.5 * np.cos(th)])
        c2w = look_at(pos)
        img, depth = render_sphere(H, W, focal, c2w)
        imgs.append(img); depths.append(depth)
        # LLFF storage convention: [-u, r, -t] columns + hwf; inverse of the
        # loader's [r, u, -t] fix. Full-res h/w/f = factor × downsampled.
        store = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:]], axis=1)
        hwf = np.array([[H * args.factor], [W * args.factor],
                        [focal * args.factor]], np.float32)
        p35 = np.concatenate([store, hwf], axis=1)
        rows.append(np.concatenate([p35.ravel(), [1.0, 4.0]]))

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "poses_bounds.npy"), np.stack(rows))

    sub = os.path.join(args.out, f"images_{args.factor}")
    for d in ("RGB_inpainted", "label", "Depth_inpainted"):
        os.makedirs(os.path.join(sub, d), exist_ok=True)
    # Held-out ground truth for the test poses (not part of the SPIn-NeRF
    # layout — the loader picks it up opportunistically for eval PSNR).
    os.makedirs(os.path.join(sub, "test_gt"), exist_ok=True)
    for k in range(args.n_test):
        img8 = (np.clip(imgs[k], 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(sub, "test_gt", f"img_{k:03d}.png"), img8)
    # Train images only in the asset dirs (test poses lead poses_bounds).
    for k in range(args.n_test, n_total):
        name = f"img_{k:03d}.png"
        img8 = (np.clip(imgs[k], 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(sub, "RGB_inpainted", name), img8)
        mask = np.zeros((H, W), np.uint8)
        mask[H // 3: H // 2, W // 3: W // 2] = 255
        imageio.imwrite(os.path.join(sub, "label", name), mask)
        disp = 1.0 / np.maximum(depths[k], 1e-3)
        disp8 = (disp / disp.max() * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(sub, "Depth_inpainted", name), disp8)
    print(f"wrote {n_total} poses ({args.n_test} test) to {args.out}")


if __name__ == "__main__":
    main()
