"""Camera ray generation (pinhole model, NDC reparametrization).

Behavioral parity with the reference ray helpers
(/root/reference/DS_NeRF/run_nerf_helpers.py:251-303): OpenGL-style camera
(x right, y up, z backward), pixel (i, j) maps to direction
((i - W/2)/f, -(j - H/2)/f, -1) rotated by c2w.

TPU-first design notes: all functions are pure jnp, shape-static, and safe
under jit/vmap/pjit. Full-image ray grids are generated on device (the
reference materializes numpy ray banks on host; we generate rays from pose +
pixel ids inside the jitted step so only poses/images live in HBM).
"""
from __future__ import annotations

import jax.numpy as jnp


def get_rays(H: int, W: int, focal, c2w, *, dtype=jnp.float32):
    """Full-image ray grid for one camera.

    Args:
      H, W: static image size.
      focal: scalar focal length (or array broadcastable to [H, W]).
      c2w: [3, 4] or [4, 4] camera-to-world matrix.

    Returns:
      rays_o, rays_d: each [H, W, 3].
    """
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    dirs = jnp.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -jnp.ones_like(i)], axis=-1
    )
    # Broadcast-sum instead of matmul: a 3-wide contraction gains nothing from
    # the MXU and elementwise keeps full fp32 precision on TPU.
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_by_coord(H: int, W: int, focal, c2w, coords):
    """Rays through arbitrary (x, y) pixel coordinates.

    Parity with get_rays_by_coord_np (run_nerf_helpers.py:277); used for
    COLMAP sparse-depth supervision where rays go through reprojected 2D
    keypoints.

    Args:
      coords: [N, 2] (x, y) pixel coordinates (float).
    Returns:
      rays_o, rays_d: each [N, 3].
    """
    x = (coords[:, 0] - W * 0.5) / focal
    y = -(coords[:, 1] - H * 0.5) / focal
    dirs = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal, near, rays_o, rays_d):
    """Shift rays to the near plane and map to NDC space.

    Parity with ndc_rays (run_nerf_helpers.py:285-303); used for
    forward-facing LLFF scenes when --no_ndc is off.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox / oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -1.0 / (W / (2.0 * focal)) * (dx / dz - ox / oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
