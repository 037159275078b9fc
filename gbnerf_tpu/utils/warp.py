"""Cross-view reprojection / correspondence (warp-geometry capability).

Compact jnp reimplementation of the reference's utils/warp_geometry.py /
correspondence_utils.py capability (cross-view pixel warping via rendered
depth): back-project view A's pixels with its depth map, transform A→B,
project into B, report coordinates + validity.
"""
from __future__ import annotations

import jax.numpy as jnp


def reproject(depth_a, K, c2w_a, c2w_b):
    """Warp every pixel of view A into view B using A's depth.

    Cameras use the OpenGL convention (x right, y up, z backward; rays along
    −z), matching the rest of the framework.

    Args:
      depth_a: [H, W] depth along −z of camera A.
      K: [3, 3] intrinsics (same for both views).
      c2w_a, c2w_b: [3, 4] camera-to-world.

    Returns:
      coords_b: [H, W, 2] (x, y) pixel positions in view B.
      depth_b: [H, W] per-pixel depth in B's frame.
      valid: [H, W] bool — in front of B and inside its image bounds.
    """
    H, W = depth_a.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    j = jnp.arange(H, dtype=depth_a.dtype)[:, None]
    i = jnp.arange(W, dtype=depth_a.dtype)[None, :]
    # camera-space points of A (z backward → points at −depth along z)
    x = (i - cx) * depth_a / fx
    y = -(j - cy) * depth_a / fy
    z = -depth_a
    pts_a = jnp.stack([x, y, z], axis=-1)

    # A camera → world
    world = pts_a @ c2w_a[:3, :3].T + c2w_a[:3, 3]
    # world → B camera
    rel = world - c2w_b[:3, 3]
    pts_b = rel @ c2w_b[:3, :3]          # R_b^T · rel

    depth_b = -pts_b[..., 2]
    eps = 1e-8
    u = fx * pts_b[..., 0] / jnp.maximum(depth_b, eps) + cx
    v = -fy * pts_b[..., 1] / jnp.maximum(depth_b, eps) + cy
    coords_b = jnp.stack([u, v], axis=-1)

    valid = ((depth_b > eps) & (u >= 0) & (u <= W - 1)
             & (v >= 0) & (v <= H - 1))
    return coords_b, depth_b, valid


def bilinear_sample(img, coords):
    """Sample [H, W, C] at float (x, y) coords [..., 2] (border-clamped)."""
    H, W = img.shape[:2]
    x = jnp.clip(coords[..., 0], 0.0, W - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00, v01 = img[y0, x0], img[y0, x1]
    v10, v11 = img[y1, x0], img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
