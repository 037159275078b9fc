#!/usr/bin/env python
"""Generate a tiny synthetic LLFF/SPIn-NeRF-layout dataset for smoke tests
and for the weights-free guidance ablation.

Writes: poses_bounds.npy, images_4/RGB_inpainted/*.png, images_4/label/*.png,
images_4/Depth_inpainted/*.png — the exact on-disk layout the reference
loader (and ours) expects. The scene is a diffuse sphere at the origin viewed
from a forward-facing arc, so renders have real parallax/depth structure.

Tasks:
  clean   (default) — the round-1 smoke scene: clean renders, a dummy
          rectangular mask, clean-disparity depth maps.
  inpaint — the SPIn-NeRF object-removal simulation: the photographed scene
          contains an INTRUDER object; the training images are "2D-inpainted"
          versions (clean background restored inside the intruder mask, then
          corrupted per-view with a view-INCONSISTENT tint + low-frequency
          noise + blur, mimicking what per-frame 2D inpainters produce);
          the label masks are the dilated intruder silhouettes; the depth
          maps are clean disparity (simulating depth inpainting); and
          test_gt/ holds the CLEAN held-out views plus their intruder
          silhouette masks (mask_*.png) for masked-region eval metrics.
          Reference task setup: SPIn-NeRF data layout, /root/reference/
          DS_NeRF/load_llff.py:436-476 (RGB_inpainted + label dirs).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

MAIN_SPHERE = (np.zeros(3), 0.5, np.array([0.8, 0.35, 0.25]))
INTRUDER = (np.array([0.45, -0.05, 0.95]), 0.22, np.array([0.2, 0.65, 0.3]))


def look_at(pos, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    z = pos - target
    z = z / np.linalg.norm(z)            # camera backward (OpenGL)
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, pos], axis=1).astype(np.float32)  # [3,4]


def render_scene(H, W, focal, c2w, spheres=(MAIN_SPHERE,), *,
                 light=(0.5, 0.7, 0.5), sky_tint=(0.6, 0.7, 0.9)):
    """Analytic render of lambertian spheres on a sky gradient.

    Returns (img [H,W,3], depth [H,W], hit_id [H,W] int — -1 = sky, else
    index into `spheres` of the nearest hit).
    """
    j, i = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1)
    rd = dirs @ c2w[:3, :3].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = c2w[:3, 3]
    light = np.asarray(light, np.float64); light = light / np.linalg.norm(light)

    t_best = np.full((H, W), np.inf, np.float32)
    hit_id = np.full((H, W), -1, np.int32)
    img = np.stack([0.5 + 0.3 * rd[..., 1]] * 3, -1) * np.asarray(sky_tint)
    for si, (center, radius, albedo) in enumerate(spheres):
        oc = ro - np.asarray(center)
        b = 2 * rd @ oc
        c = oc @ oc - radius ** 2
        disc = b ** 2 - 4 * c
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
        closer = (t > 0) & (t < t_best)
        # finite t only where used (miss rays carry inf; shading there is
        # discarded by the `closer` select below)
        pts = ro + np.where(closer, t, 0.0)[..., None] * rd
        n = (pts - np.asarray(center)) / radius
        lam = np.clip(n @ light, 0, 1)
        shade = np.asarray(albedo) * (0.2 + 0.8 * lam[..., None])
        img = np.where(closer[..., None], shade, img)
        t_best = np.where(closer, t, t_best)
        hit_id = np.where(closer, si, hit_id)
    depth = np.where(np.isfinite(t_best), t_best, 4.0).astype(np.float32)
    return img.astype(np.float32), depth, hit_id


# ---- hard scene family (round 5, VERDICT r4 #6) -------------------------
# Textured high-frequency world + NON-CONVEX occluder: the sphere-family
# scenes hand stage-1 a posterior-mean crutch (smooth background ⇒ the
# multi-view average nearly recovers it). This family removes that crutch:
# the background is a procedurally textured backdrop+ground (world-space
# value noise + stripes + checker — view-consistent but high-frequency, so
# a blurry hole-fill costs PSNR), and the main object is a tilted TORUS
# (the background stays visible through the hole; occlusion boundaries are
# doubly-curved). Rendered by vectorized numpy sphere tracing.

def _hash01(ix, iy, iz, off=0):
    """Deterministic int-lattice hash → [0, 1) (numpy-only, vectorized)."""
    h = (ix.astype(np.int64) * 374761393 + iy.astype(np.int64) * 668265263
         + iz.astype(np.int64) * 1440662683 + np.int64(off) * 1274126177)
    h = (h ^ (h >> 13)) * 1103515245
    h = h ^ (h >> 16)
    return (h & 0xFFFFFF).astype(np.float32) / float(0xFFFFFF)


def value_noise(p, scale, off=0):
    """Trilinear-interpolated lattice noise at world points p [..., 3]."""
    q = p * scale
    q0 = np.floor(q)
    f = q - q0
    f = f * f * (3.0 - 2.0 * f)
    ix, iy, iz = (q0[..., 0].astype(np.int64), q0[..., 1].astype(np.int64),
                  q0[..., 2].astype(np.int64))
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    def corner(dx, dy, dz):
        return _hash01(ix + dx, iy + dy, iz + dz, off)

    c = [[corner(dx, dy, 0) * (1 - fz) + corner(dx, dy, 1) * fz
          for dy in (0, 1)] for dx in (0, 1)]
    cx = [c[0][dy] * (1 - fx) + c[1][dy] * fx for dy in (0, 1)]
    return cx[0] * (1 - fy) + cx[1] * fy


def world_texture(p, tex):
    """High-frequency view-consistent surface color at world points p.

    Two noise octaves + a stripe field + a 3D checker, mixed over a random
    3-color palette. All parameters live in `tex` so the prior trainer can
    randomize whole texture worlds."""
    n1 = value_noise(p, tex["f1"], off=tex["off"])
    n2 = value_noise(p, tex["f2"], off=tex["off"] + 1)
    stripes = 0.5 + 0.5 * np.sin(
        tex["sf"] * (p[..., 0] + 0.7 * p[..., 1] - 0.4 * p[..., 2])
        + 5.0 * n1)
    checker = ((np.floor(p[..., 0] * tex["cs"])
                + np.floor(p[..., 1] * tex["cs"])
                + np.floor(p[..., 2] * tex["cs"])) % 2).astype(np.float32)
    pal = np.asarray(tex["pal"], np.float32)          # [3, 3]
    col = (pal[0] * (1 - stripes[..., None]) + pal[1] * stripes[..., None])
    col = col * (0.55 + 0.45 * checker[..., None])
    col = col + pal[2] * (n2[..., None] - 0.5) * 0.8
    return np.clip(col, 0.0, 1.0)


DEFAULT_HARD = dict(
    R0=0.45, r0=0.16,                      # torus major/minor radii
    tilt=(0.9, 0.25),                      # rotation about x then z (rad)
    zb=-1.2, yg=-0.65,                     # backdrop z / ground y planes
    light=(0.5, 0.7, 0.5), sky_tint=(0.6, 0.7, 0.9),
    tex=dict(f1=3.1, f2=11.7, sf=9.0, cs=4.0, off=0,
             pal=((0.85, 0.55, 0.25), (0.15, 0.3, 0.55), (0.6, 0.6, 0.6))),
    tex_obj=dict(f1=4.3, f2=14.2, sf=13.0, cs=6.0, off=17,
                 pal=((0.8, 0.25, 0.3), (0.9, 0.8, 0.3), (0.4, 0.4, 0.4))),
)


def _rot_xz(ax, az):
    cx, sx = np.cos(ax), np.sin(ax)
    cz, sz = np.cos(az), np.sin(az)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Rz @ Rx).astype(np.float32)


def render_scene_hard(H, W, focal, c2w, *, hp=None, with_intruder=False):
    """Sphere-traced render of the hard family. Same contract as
    `render_scene`: returns (img, depth, hit_id) with hit_id==1 marking the
    intruder (−1 = sky; 0 torus, 2 backdrop, 3 ground)."""
    hp = {**DEFAULT_HARD, **(hp or {})}
    Rm = _rot_xz(*hp["tilt"])
    icen, irad, _ = INTRUDER

    j, i = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1)
    rd = dirs @ c2w[:3, :3].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = c2w[:3, 3].astype(np.float32)

    def comp_d(p):
        q = p @ Rm.T                      # torus frame (Rm maps frame→world)
        qx = np.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - hp["R0"]
        ds = [np.sqrt(qx ** 2 + q[..., 1] ** 2) - hp["r0"]]
        if with_intruder:
            ds.append(np.linalg.norm(p - np.asarray(icen, np.float32),
                                     axis=-1) - irad)
        else:
            ds.append(np.full(p.shape[:-1], np.inf, np.float32))
        ds.append(p[..., 2] - hp["zb"])   # backdrop plane (camera side)
        ds.append(p[..., 1] - hp["yg"])   # ground plane
        return np.stack(ds, axis=-1)      # [..., 4]

    sdf = lambda p: comp_d(p).min(axis=-1)
    t = np.full((H, W), 0.05, np.float32)
    for _ in range(128):
        d = sdf(ro + t[..., None] * rd)
        t = np.minimum(t + 0.9 * np.where(t < 4.2, d, 0.0), 4.2)
    p = ro + t[..., None] * rd
    dcomp = comp_d(p)
    hit = (dcomp.min(axis=-1) < 3e-3) & (t < 3.99)
    cid = np.where(hit, dcomp.argmin(axis=-1).astype(np.int32), -1)

    eps = 1e-3
    n = np.stack([sdf(p + np.eye(3, dtype=np.float32)[k] * eps)
                  - sdf(p - np.eye(3, dtype=np.float32)[k] * eps)
                  for k in range(3)], -1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    light = np.asarray(hp["light"], np.float64)
    light = light / np.linalg.norm(light)
    lam = np.clip(n @ light, 0, 1)[..., None].astype(np.float32)

    albedo = world_texture(p, hp["tex"])                    # planes
    albedo = np.where((cid == 0)[..., None],
                      world_texture(p @ Rm.T, hp["tex_obj"]), albedo)
    if with_intruder:
        albedo = np.where((cid == 1)[..., None],
                          np.asarray(INTRUDER[2], np.float32), albedo)
    shade = albedo * (0.25 + 0.75 * lam)
    sky = (np.stack([0.5 + 0.3 * rd[..., 1]] * 3, -1)
           * np.asarray(hp["sky_tint"], np.float32))
    img = np.where((cid >= 0)[..., None], shade, sky)
    depth = np.where(cid >= 0, t, 4.0).astype(np.float32)
    return np.clip(img, 0, 1).astype(np.float32), depth, cid


def random_hard_params(rng):
    """A random hard-family world (for the domain-prior trainer)."""

    def pal():
        return tuple(tuple(rng.uniform(0.05, 0.95, 3)) for _ in range(3))

    def tex(off):
        return dict(f1=rng.uniform(2.0, 4.5), f2=rng.uniform(8.0, 16.0),
                    sf=rng.uniform(6.0, 14.0), cs=rng.uniform(2.5, 6.0),
                    off=int(off), pal=pal())

    return dict(
        R0=rng.uniform(0.3, 0.55), r0=rng.uniform(0.1, 0.22),
        tilt=(rng.uniform(0.3, 1.3), rng.uniform(-0.6, 0.6)),
        zb=rng.uniform(-1.5, -1.0), yg=rng.uniform(-0.8, -0.5),
        light=tuple(rng.uniform(0.2, 0.9, 3)),
        sky_tint=tuple(rng.uniform(0.4, 1.0, 3)),
        tex=tex(rng.integers(1 << 20)), tex_obj=tex(rng.integers(1 << 20)))


def render_sphere(H, W, focal, c2w, radius=0.5):
    """Round-1 single-sphere API (kept for callers/tests)."""
    img, depth, _ = render_scene(
        H, W, focal, c2w, ((MAIN_SPHERE[0], radius, MAIN_SPHERE[2]),))
    return img, depth


def dilate(mask: np.ndarray, it: int = 2) -> np.ndarray:
    """Binary dilation by `it` 4-neighborhood steps (numpy-only)."""
    m = mask.astype(bool)
    for _ in range(it):
        m = (m | np.roll(m, 1, 0) | np.roll(m, -1, 0)
             | np.roll(m, 1, 1) | np.roll(m, -1, 1))
    return m


def _box_blur(img: np.ndarray, it: int = 2) -> np.ndarray:
    """Repeated 3×3 box blur (numpy-only, edge-clamped)."""
    out = img.astype(np.float32)
    for _ in range(it):
        p = np.pad(out, ((1, 1), (1, 1), (0, 0)), mode="edge")
        out = sum(p[1 + dy:p.shape[0] - 1 + dy, 1 + dx:p.shape[1] - 1 + dx]
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0
    return out


def corrupt_inpainting(clean: np.ndarray, mask: np.ndarray,
                       rng: np.random.Generator,
                       mode: str = "struct") -> np.ndarray:
    """Simulate one frame of a per-view 2D inpainter: the masked region is
    plausibly filled (we start from the clean background) but carries
    view-INCONSISTENT artifacts, which is exactly the inconsistency stage-2
    guidance exists to fix (SPIn-NeRF's motivation; reference README.md:7).

    mode="tint" (the round-2 sim): a per-view color tint + low-frequency
    noise + blur. Adequate at few views, but across ≥16 views the artifacts
    are zero-mean-ish and the NeRF's multi-view average nearly recovers the
    clean background — stage-1 alone reaches ~32 dB masked at 252×189/16
    views, leaving guidance nothing to fix.

    mode="struct" (round-3 production sim): additionally composites 2-4
    per-view HALLUCINATED soft blobs (random position/size/color inside the
    mask bbox) — real 2D inpainters (LaMa/SD) hallucinate different
    STRUCTURE per frame, so the cross-view mean is blurry mush, not the
    clean background. Blob geometry scales with the mask bbox and the blur
    with resolution, keeping the difficulty resolution-independent."""
    H, W = mask.shape
    tint = rng.uniform(0.1, 0.9, 3).astype(np.float32)
    # low-frequency noise: bilinear-upsampled coarse field
    coarse = rng.uniform(-1, 1, (6, 8, 3)).astype(np.float32)
    yy = np.linspace(0, coarse.shape[0] - 1, H)
    xx = np.linspace(0, coarse.shape[1] - 1, W)
    y0 = np.clip(yy.astype(int), 0, coarse.shape[0] - 2)
    x0 = np.clip(xx.astype(int), 0, coarse.shape[1] - 2)
    fy = (yy - y0)[:, None, None]
    fx = (xx - x0)[None, :, None]
    c00 = coarse[y0][:, x0]
    c01 = coarse[y0][:, x0 + 1]
    c10 = coarse[y0 + 1][:, x0]
    c11 = coarse[y0 + 1][:, x0 + 1]
    noise = ((1 - fy) * ((1 - fx) * c00 + fx * c01)
             + fy * ((1 - fx) * c10 + fx * c11))
    filled = 0.65 * clean + 0.35 * tint + 0.15 * noise
    if mode == "struct":
        ys, xs = np.where(mask > 0)
        if len(ys):
            gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
            hh = max(float(ys.max() - ys.min()), 4.0)
            ww = max(float(xs.max() - xs.min()), 4.0)
            for _ in range(rng.integers(2, 5)):
                cy = rng.uniform(ys.min(), ys.max())
                cx = rng.uniform(xs.min(), xs.max())
                ry = rng.uniform(0.15, 0.45) * hh
                rx = rng.uniform(0.15, 0.45) * ww
                w = np.exp(-(((gy - cy) / ry) ** 2
                             + ((gx - cx) / rx) ** 2))[..., None]
                col = rng.uniform(0.0, 1.0, 3).astype(np.float32)
                filled = filled * (1 - 0.8 * w) + col * (0.8 * w)
    filled = _box_blur(filled, it=max(2, W // 64))
    m = mask[..., None].astype(np.float32)
    return np.clip(clean * (1 - m) + filled * m, 0, 1)


def write_colmap_sparse(out, cams, depths, H, W, focal, factor,
                        n_test, n_train, rng, n_sparse=200,
                        noise_rel=0.005):
    """Synthetic COLMAP sparse model → `colmap_depth = True` supervision.

    Surface points are sampled from the analytic geometry per TRAIN view,
    back-projected exactly, then perturbed by ~noise_rel·depth of 3D noise
    with a per-point reprojection `error` (the loader weights by
    2·exp(−(err/ē)²), load_llff.py:507).

    Layout is constructed to be geometrically correct UNDER the
    reference's +skip_first pairing (load_llff.py:491-498, reproduced in
    data/llff.py::load_colmap_depth): the loader pairs the KEYPOINTS at
    sorted-id position k+skip with the POSE at position k, so positions
    0..n_train-1 carry the train poses (in train order) and position
    k+n_test carries train view k's keypoints; the first n_test keypoint
    sets are empty (never read).
    """
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gbnerf_tpu.data.colmap import (Camera, Image, Point3D, rotmat2qvec,
                                        write_cameras_binary,
                                        write_images_binary,
                                        write_points3d_binary)

    n_total = n_test + n_train

    def w2c_colmap(c2w_gl):
        # GL/NeRF camera (x right, y up, z backward) → COLMAP (x right,
        # y down, z forward): flip the y/z columns, then invert.
        R = np.stack([c2w_gl[:3, 0], -c2w_gl[:3, 1], -c2w_gl[:3, 2]], axis=1)
        t = c2w_gl[:3, 3]
        Rw2c = R.T
        return Rw2c, -Rw2c @ t

    # pose by position: [train_0..train_{n-1}, test_0..test_{n_test-1}]
    pose_order = list(range(n_test, n_total)) + list(range(n_test))
    points, images = {}, {}
    pid = 1
    for pos_idx in range(n_total):
        img_id = pos_idx + 1
        Rw2c, tvec = w2c_colmap(cams[pose_order[pos_idx]])
        xys = np.zeros((0, 2), np.float64)
        p3d_ids = np.zeros((0,), np.int64)
        if pos_idx >= n_test:                    # train view k's keypoints
            k_scene = n_test + (pos_idx - n_test)
            c2w = cams[k_scene]
            dep = depths[k_scene]
            hit = np.argwhere(dep < 3.99)        # sky carries the 4.0 cap
            sel = hit[rng.choice(len(hit), min(n_sparse, len(hit)),
                                 replace=False)]
            xy_l, id_l = [], []
            for (y, x) in sel:
                d = np.array([(x - W / 2) / focal, -(y - H / 2) / focal,
                              -1.0])
                rd = c2w[:3, :3] @ d
                rd = rd / np.linalg.norm(rd)
                p = c2w[:3, 3] + dep[y, x] * rd
                err = float(rng.uniform(0.3, 1.5))
                p = p + rng.normal(0, noise_rel * dep[y, x] * err, 3)
                points[pid] = Point3D(
                    id=pid, xyz=p.astype(np.float64),
                    rgb=np.array([128, 128, 128], np.uint8), error=err,
                    image_ids=np.array([img_id]),
                    point2D_idxs=np.array([len(xy_l)]))
                xy_l.append([x * factor, y * factor])
                id_l.append(pid)
                pid += 1
            xys = np.array(xy_l, np.float64)
            p3d_ids = np.array(id_l, np.int64)
        images[img_id] = Image(
            id=img_id, qvec=rotmat2qvec(Rw2c), tvec=tvec.astype(np.float64),
            camera_id=1, name=f"img_{pos_idx:03d}.png", xys=xys,
            point3D_ids=p3d_ids)

    cam = Camera(id=1, model="SIMPLE_PINHOLE", width=W * factor,
                 height=H * factor,
                 params=np.array([focal * factor, W * factor / 2.0,
                                  H * factor / 2.0]))
    sp = os.path.join(out, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    write_cameras_binary({1: cam}, os.path.join(sp, "cameras.bin"))
    write_images_binary(images, os.path.join(sp, "images.bin"))
    write_points3d_binary(points, os.path.join(sp, "points3D.bin"))
    return len(points)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--task", choices=("clean", "inpaint"), default="clean")
    ap.add_argument("--family", choices=("spheres", "hard"),
                    default="spheres",
                    help="scene family: 'spheres' = the round-1..4 diffuse "
                         "sphere on a smooth sky; 'hard' = textured "
                         "high-frequency backdrop/ground + non-convex torus "
                         "occluder (VERDICT r4 #6 — removes the "
                         "posterior-mean crutch the smooth background hands "
                         "stage-1)")
    ap.add_argument("--n_train", type=int, default=6)
    ap.add_argument("--n_test", type=int, default=2)
    ap.add_argument("--H", type=int, default=48)
    ap.add_argument("--W", type=int, default=64)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--corruption", choices=("tint", "struct"),
                    default="struct",
                    help="per-view 2D-inpainter artifact model (see "
                         "corrupt_inpainting; round-2 numbers used 'tint')")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--colmap_sparse", action="store_true",
                    help="emit a synthetic sparse/0 COLMAP model so the "
                         "scene trains with colmap_depth = True (the "
                         "reference's shipped depth supervision, "
                         "aconfig_1.txt:40-42)")
    ap.add_argument("--n_sparse", type=int, default=200,
                    help="sparse surface points per train view")
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
    imgs, depths, masks, cams = [], [], [], []
    for k in range(n_total):
        slot = slot_order[k]
        th = (slot / n_total - 0.5) * 0.9
        pos = np.array([2.5 * np.sin(th), 0.3 * np.sin(2 * th),
                        2.5 * np.cos(th)])
        c2w = look_at(pos)
        # Clean scene (the ground truth "after object removal").
        if args.family == "hard":
            img, depth, _ = render_scene_hard(H, W, focal, c2w)
        else:
            img, depth, _ = render_scene(H, W, focal, c2w)
        if args.task == "inpaint":
            # The photographed scene contains the intruder; its silhouette
            # (dilated) is the inpaint mask.
            if args.family == "hard":
                _, _, hid = render_scene_hard(H, W, focal, c2w,
                                              with_intruder=True)
            else:
                _, _, hid = render_scene(H, W, focal, c2w,
                                         (MAIN_SPHERE, INTRUDER))
            mask = dilate(hid == 1, it=2).astype(np.uint8)
        else:
            mask = np.zeros((H, W), np.uint8)
            mask[H // 3: H // 2, W // 3: W // 2] = 1
        imgs.append(img); depths.append(depth); masks.append(mask)
        cams.append(c2w)
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

    if args.colmap_sparse:
        npts = write_colmap_sparse(
            args.out, cams, depths, H, W, focal, args.factor,
            args.n_test, args.n_train, np.random.default_rng(args.seed + 7),
            n_sparse=args.n_sparse)
        print(f"wrote sparse/0 COLMAP model ({npts} points)")

    sub = os.path.join(args.out, f"images_{args.factor}")
    for d in ("RGB_inpainted", "label", "Depth_inpainted"):
        os.makedirs(os.path.join(sub, d), exist_ok=True)
    # Held-out ground truth for the test poses (not part of the SPIn-NeRF
    # layout — the loader picks it up opportunistically for eval PSNR).
    os.makedirs(os.path.join(sub, "test_gt"), exist_ok=True)
    for k in range(args.n_test):
        img8 = (np.clip(imgs[k], 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(sub, "test_gt", f"img_{k:03d}.png"), img8)
        if args.task == "inpaint":
            # Test-view intruder masks → masked-region eval metrics.
            imageio.imwrite(os.path.join(sub, "test_gt", f"mask_{k:03d}.png"),
                            masks[k] * 255)
    # Train images only in the asset dirs (test poses lead poses_bounds).
    rng = np.random.default_rng(args.seed)
    for k in range(args.n_test, n_total):
        name = f"img_{k:03d}.png"
        train_img = imgs[k]
        if args.task == "inpaint":
            train_img = corrupt_inpainting(imgs[k], masks[k], rng,
                                           mode=args.corruption)
        img8 = (np.clip(train_img, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(sub, "RGB_inpainted", name), img8)
        imageio.imwrite(os.path.join(sub, "label", name), masks[k] * 255)
        disp = 1.0 / np.maximum(depths[k], 1e-3)
        if args.task == "inpaint" and args.corruption == "struct":
            # Depth_inpainted fidelity: the reference's depth maps are
            # themselves 2D-INPAINTED (SPIn-NeRF pipeline) — inside the
            # mask they carry per-view low-frequency error, they are not
            # ground truth. Clean per-view depth would hand stage-1 a
            # perfect geometric crutch inside the mask that no real scene
            # provides (measured: with clean depth, stage-1's masked
            # region interpolates to 32.3 dB at 252×189/16 views and
            # stage-2 has nothing left to fix).
            coarse = rng.uniform(-1.0, 1.0, (5, 6)).astype(np.float32)
            hh, ww = disp.shape
            yy = np.linspace(0, coarse.shape[0] - 1.001, hh)
            xx = np.linspace(0, coarse.shape[1] - 1.001, ww)
            y0, x0 = yy.astype(int), xx.astype(int)
            fy, fx = (yy - y0)[:, None], (xx - x0)[None, :]
            c = ((1 - fy) * ((1 - fx) * coarse[y0][:, x0]
                             + fx * coarse[y0][:, x0 + 1])
                 + fy * ((1 - fx) * coarse[y0 + 1][:, x0]
                         + fx * coarse[y0 + 1][:, x0 + 1]))
            disp = np.where(masks[k] > 0, disp * (1.0 + 0.25 * c), disp)
        disp8 = (disp / disp.max() * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(sub, "Depth_inpainted", name), disp8)
    print(f"wrote {n_total} poses ({args.n_test} test, task={args.task}) "
          f"to {args.out}")


if __name__ == "__main__":
    main()
