"""Blender-synthetic dataset loader (+ inpainting mask/object dirs).

Parity with /root/reference/DS_NeRF/load_blender.py: transforms_{split}.json
→ RGBA images + c2w poses, camera_angle_x → focal, spherical render path
(40 views at φ=-30°, r=4), optional mask/ (m_*.png) and object/ (o_*.png)
companions for train frames, half_res downsampling, testskip.
"""
from __future__ import annotations

import json
import os
import numpy as np


def _trans_t(t):
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def _rot_phi(phi):
    m = np.eye(4, dtype=np.float32)
    m[1, 1] = np.cos(phi); m[1, 2] = -np.sin(phi)
    m[2, 1] = np.sin(phi); m[2, 2] = np.cos(phi)
    return m


def _rot_theta(th):
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = np.cos(th); m[0, 2] = -np.sin(th)
    m[2, 0] = np.sin(th); m[2, 2] = np.cos(th)
    return m


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                    np.float32)
    return flip @ c2w


def load_blender_data(basedir: str, half_res: bool = False, testskip: int = 1):
    """Returns (imgs RGBA [N,H,W,4], poses [N,4,4], render_poses, [H,W,focal],
    i_split (train/val/test index arrays), masks [Nt,H,W], objects)."""
    import imageio.v2 as imageio

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, masks, objects, counts = [], [], [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            if s == "train":
                d, base = os.path.split(fname)
                stem = base[2:-4] if base.startswith("r_") else base[:-4]
                for sub, prefix, dest in (("mask", "m_", masks),
                                          ("object", "o_", objects)):
                    # Reference resolves companions INSIDE the split dir:
                    # fname.split('/r_')[0] + '/mask/m_*.png' →
                    # <base>/train/mask/ (load_blender.py:58-62); scene-root
                    # <base>/mask/ kept as a tolerant fallback.
                    p_split = os.path.join(d, sub, f"{prefix}{stem}.png")
                    p_root = os.path.join(os.path.dirname(d), sub,
                                          f"{prefix}{stem}.png")
                    for cand in (p_split, p_root):
                        if os.path.exists(cand):
                            dest.append(np.asarray(imageio.imread(cand)))
                            break
            imgs.append(np.asarray(imageio.imread(fname)))
            poses.append(np.array(frame["transform_matrix"], np.float32))
        imgs = (np.stack(imgs) / 255.0).astype(np.float32)
        counts.append(counts[-1] + len(imgs))
        all_imgs.append(imgs)
        all_poses.append(np.stack(poses))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs)
    poses = np.concatenate(all_poses)
    masks_a = (np.stack(masks).astype(np.float32) / 255.0 if masks
               else np.zeros((0,) + imgs.shape[1:3], np.float32))
    objects_a = (np.stack(objects).astype(np.float32) / 255.0 if objects
                 else np.zeros((0,) + imgs.shape[1:3], np.float32))

    H, W = imgs[0].shape[:2]
    focal = 0.5 * W / np.tan(0.5 * float(metas["test"]["camera_angle_x"]))
    render_poses = np.stack([pose_spherical(a, -30.0, 4.0)
                             for a in np.linspace(-180, 180, 41)[:-1]])

    if half_res:
        import cv2

        H, W, focal = H // 2, W // 2, focal / 2.0
        imgs = np.stack([cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA)
                         for im in imgs])
        if len(masks_a):
            masks_a = np.stack([cv2.resize(m, (W, H),
                                           interpolation=cv2.INTER_AREA)
                                for m in masks_a])
        if len(objects_a):
            objects_a = np.stack([cv2.resize(o, (W, H),
                                             interpolation=cv2.INTER_AREA)
                                  for o in objects_a])

    return imgs, poses, render_poses, [H, W, focal], i_split, masks_a, objects_a


def load_dtu_data(path: str):
    """DTU loader parity (/root/reference/DS_NeRF/load_dtu.py): image/ dir +
    cameras.npz with world_mat_i (P = K[R|t]) and optional scale_mat_i."""
    import cv2
    import imageio.v2 as imageio

    imgdir = os.path.join(path, "image")
    imgfiles = [os.path.join(imgdir, f) for f in sorted(os.listdir(imgdir))
                if f.lower().endswith((".jpg", ".png"))]
    imgs = np.stack([np.asarray(imageio.imread(f))[..., :3] / 255.0
                     for f in imgfiles]).astype(np.float32)

    cams = np.load(os.path.join(path, "cameras.npz"))
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    poses, focal = [], 0.0
    for i in range(len(imgs)):
        P = cams[f"world_mat_{i}"][:3]
        K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
        K = K / K[2, 2]
        focal += (K[0, 0] + K[1, 1]) / 2.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R.T
        pose[:3, 3] = (t[:3] / t[3])[:, 0]
        scale = cams.get(f"scale_mat_{i}")
        if scale is not None:
            pose[:3, 3:] -= scale[:3, 3:]
            pose[:3, 3:] /= np.diagonal(scale[:3, :3])[..., None]
        poses.append((flip @ pose @ flip)[:3, :4])
    poses = np.stack(poses)
    H, W = imgs[0].shape[:2]
    return imgs, poses, [H, W, focal / len(imgs)]
