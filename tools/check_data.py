#!/usr/bin/env python
"""SPIn-NeRF / LLFF scene-dir first-contact preflight.

The day real capture data arrives, run this BEFORE any training. It loads
the scene through the SAME loader path `run.py` uses (`load_llff_data`,
`load_colmap_depth`) and validates every asset the shipped GB-NeRF config
consumes (reference layout: run.py:687-916 + DS_NeRF/load_llff.py:420-520):

  - poses_bounds.npy row count vs image count, positive bounds
  - images_{factor}/{RGB_inpainted,label,Depth_inpainted} presence +
    per-view shape agreement (auto-minify from full-res images/ works too)
  - train/test split sizes under the shipped split knobs
  - per-view inpaint-mask coverage (flags empty/full/non-binary masks)
  - inpainted-depth finiteness and range
  - degenerate pose geometry (poses_avg raises on zero up/forward vectors)
  - with --colmap: sparse/0 model readable, per-train-view kept-keypoint
    counts after the [near,far] filter (flags views with zero supervision)

Prints a summary table and PASS/FAIL. Pure numpy — never touches the TPU.

Usage:
  python tools/check_data.py /data/spinnerf/scene1 [--factor 4] [--colmap]
      [--test_split_count 40] [--llffhold 0] [--no-origin]

Pair with tools/check_weights.py (SD/LoRA/VGG first contact); the unified
day-one runbook is docs/DAY_ONE.md.
"""
import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gbnerf_tpu.data.llff import (  # noqa: E402
    load_colmap_depth, load_llff_data, load_poses_bounds)

FAILS = []
WARNS = []


def check(ok: bool, what: str, warn_only: bool = False):
    tag = "ok" if ok else ("WARN" if warn_only else "FAIL")
    print(f"  [{tag}] {what}")
    if not ok:
        (WARNS if warn_only else FAILS).append(what)


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("datadir")
    ap.add_argument("--factor", type=int, default=4,
                    help="downsample factor (aconfig_1.txt ships 4)")
    ap.add_argument("--colmap", action="store_true",
                    help="also validate sparse/0 COLMAP depth supervision "
                         "(colmap_depth=True, the shipped mode)")
    ap.add_argument("--test_split_count", type=int, default=40,
                    help="first N poses are the test split "
                         "(load_llff.py:449; SPIn-NeRF captures ship 40)")
    ap.add_argument("--llffhold", type=int, default=0)
    ap.add_argument("--no-origin", dest="origin", action="store_false",
                    help="plain images/ layout instead of the SPIn-NeRF "
                         "RGB_inpainted/label/Depth_inpainted subdirs")
    args = ap.parse_args()
    d = args.datadir

    print(f"== scene layout ({d}) ==")
    pb = os.path.join(d, "poses_bounds.npy")
    check(os.path.exists(pb), "poses_bounds.npy present")
    if not os.path.exists(pb):
        _finish()
    poses, bds = load_poses_bounds(d)
    n_poses = len(poses)
    print(f"  poses: {n_poses}, raw bounds [{bds.min():.3f}, {bds.max():.3f}]")
    check(np.isfinite(poses).all() and np.isfinite(bds).all(),
          "poses/bounds finite")
    check((bds > 0).all(), "bounds strictly positive")

    sfx = f"_{args.factor}" if args.factor and args.factor != 1 else ""
    base = os.path.join(d, "images" + sfx)
    subdirs = (["RGB_inpainted", "label", "Depth_inpainted"]
               if args.origin else [""])
    if not os.path.isdir(base):
        check(os.path.isdir(os.path.join(d, "images")),
              f"images{sfx}/ absent but full-res images/ present "
              "(will auto-minify on first load)")
    else:
        # Valid counts: one image per pose, or train-only (the synthetic
        # generator and prepared SPIn-NeRF scenes ship no images for the
        # leading test_split_count poses; the loader pairs images with the
        # TRAIN poses).
        want = {n_poses}
        if not args.llffhold:
            want.add(n_poses - args.test_split_count)
        for s in subdirs:
            p = os.path.join(base, s) if s else base
            n_img = len([f for f in os.listdir(p) if not f.startswith(".")]) \
                if os.path.isdir(p) else 0
            check(n_img in want,
                  f"images{sfx}/{s or '.'}: {n_img} files vs {n_poses} poses "
                  f"(acceptable: {sorted(want)})",
                  # depth subdir is only needed by dense-depth configs
                  warn_only=(s == "Depth_inpainted"))

    print("== loader (the exact run.py path) ==")
    try:
        scene = load_llff_data(d, args.factor, origin=args.origin,
                               test_split_count=args.test_split_count,
                               llffhold=args.llffhold)
    except Exception as e:
        check(False, f"load_llff_data raised: {e}")
        _finish()
    H, W, focal = scene.hwf
    n_tr, n_te = len(scene.poses), len(scene.poses_test)
    print(f"  {n_tr} train + {n_te} test views, {W}x{H}, focal {focal:.1f}, "
          f"near/far {scene.near:.3f}/{scene.far:.3f}")
    check(n_tr >= 2, f"train split non-degenerate ({n_tr} views)")
    check(n_te >= 1, f"test split non-empty ({n_te} views)", warn_only=True)
    check(np.isfinite(scene.images).all()
          and 0.0 <= scene.images.min() and scene.images.max() <= 1.0,
          "train images finite in [0, 1]")

    m = scene.masks
    frac = m.reshape(n_tr, -1).mean(1)
    print(f"  mask coverage/view: min {frac.min():.4f}  "
          f"median {np.median(frac):.4f}  max {frac.max():.4f}")
    check((frac > 0).all(),
          "every train view has a non-empty inpaint mask "
          f"(empty: {np.where(frac == 0)[0].tolist()})")
    check((frac < 0.9).all(), "no mask covers >90% of its view")
    binary = np.isin(np.unique(np.round(m, 3)), [0.0, 1.0]).all()
    check(bool(binary), "masks are binary after normalization",
          warn_only=True)

    dep = scene.inpainted_depths
    if args.origin and np.isfinite(dep).all() and dep.max() > dep.min():
        print(f"  inpainted depth range [{dep.min():.3f}, {dep.max():.3f}]")
        check(True, "inpainted depths finite + non-constant")
    else:
        check(not args.origin, "inpainted depths missing/degenerate "
              "(fine when colmap_depth=True — the shipped mode)",
              warn_only=True)

    if args.colmap:
        print("== COLMAP sparse depth (shipped colmap_depth=True) ==")
        sp = os.path.join(d, "sparse", "0")
        ok_model = all(os.path.exists(os.path.join(sp, f + ".bin"))
                       for f in ("images", "points3D"))
        check(ok_model, "sparse/0/{images,points3D}.bin present")
        if ok_model:
            try:
                gts = load_colmap_depth(d, args.factor,
                                        skip_first=args.test_split_count)
            except Exception as e:
                gts = []
                check(False, f"load_colmap_depth raised: {e}")
            counts = [len(g["depth"]) for g in gts]
            if counts:
                print(f"  kept keypoints/view: min {min(counts)}  "
                      f"median {int(np.median(counts))}  max {max(counts)}")
            check(len(gts) == n_tr,
                  f"{len(gts)} supervised views == {n_tr} train views "
                  "(views whose keypoints all fall outside [near,far] "
                  "are DROPPED — check test_split_count/image-id offset)")
            check(bool(counts) and min(counts) >= 5,
                  "every supervised view keeps >= 5 keypoints",
                  warn_only=True)

    _finish()


def _finish():
    print()
    if FAILS:
        print(f"FAIL — {len(FAILS)} blocking problem(s):")
        for f in FAILS:
            print(f"  - {f}")
        if WARNS:
            print(f"(+ {len(WARNS)} warning(s))")
        raise SystemExit(1)
    print("PASS" + (f" ({len(WARNS)} warning(s) — review above)"
                    if WARNS else " — scene is trainable as-is"))
    raise SystemExit(0)


if __name__ == "__main__":
    main()
