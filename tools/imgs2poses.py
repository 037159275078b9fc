#!/usr/bin/env python
"""Compute camera poses for a scene dir with COLMAP → poses_bounds.npy.

Reference entry parity (/root/reference/DS_NeRF/imgs2poses.py):

    python tools/imgs2poses.py <scenedir> [--match_type exhaustive_matcher]
"""
from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenedir")
    ap.add_argument("--match_type", default="exhaustive_matcher",
                    choices=["exhaustive_matcher", "sequential_matcher"])
    ap.add_argument("--colmap_bin", default="colmap")
    args = ap.parse_args()

    from gbnerf_tpu.data.pose_utils import gen_poses

    arr = gen_poses(args.scenedir, args.match_type, args.colmap_bin)
    print(f"wrote poses_bounds.npy with {len(arr)} poses")


if __name__ == "__main__":
    main()
