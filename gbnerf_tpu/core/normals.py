"""Normal-map derivation from rendered depth.

Parity targets (/root/reference/run.py:2383-2474):
  - depth2xyz: back-project depth to camera-space points via intrinsics.
  - depth2normal_geo: per-pixel least-squares plane fit over a k×k window —
    n(p) = (AᵀA)⁻¹ Aᵀ1 with A the window's points (k=31), zero padding.
  - estimate_normals: cheap gradient-based normals.

TPU-first redesign of depth2normal_geo: the reference materializes the k×k
unfold ([B, 3k², H·W] — 961× blowup at k=31) and batch-inverts 3×3 matrices.
Here AᵀA = Σ ppᵀ and Aᵀ1 = Σ p are 9 windowed-sum channels computed with a
separable box filter (two cumsum-difference passes, O(HW) independent of k;
zero padding contributes p=0 rows, which add 0 to both sums — identical
semantics), then a closed-form adjugate solve. No gathers, no 961-wide
intermediates, everything fuses on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def depth2xyz(depth, K):
    """Back-project a depth map to camera-space points.

    Args:
      depth: [H, W] depth along the camera z axis.
      K: [3, 3] intrinsics (fx, fy, cx, cy).

    Returns:
      [H, W, 3] points.
    """
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    h = jnp.arange(H, dtype=depth.dtype)[:, None]
    w = jnp.arange(W, dtype=depth.dtype)[None, :]
    x = (w - cx) * depth / fx
    y = (h - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def _box_sum(x, k: int):
    """Windowed sum over k×k neighborhoods (zero padding), per channel.

    x: [H, W, C] → [H, W, C] where out[i,j] = Σ_{|di|,|dj| ≤ k//2} x[i+di, j+dj]
    over IN-BOUNDS entries (zero outside — torch.nn.functional.unfold
    padding semantics, reference run.py:2462). Implemented as two
    cumulative-sum difference passes (integral image), O(HW) independent
    of k. The cumsum is front-padded with zeros and back-padded with its
    LAST value (the saturated total) so windows overhanging the bottom /
    right edges sum exactly the in-bounds entries — a zero back pad makes
    edge windows negative, and k > extent zeroed entire central rows.
    """
    r = k // 2

    def along(axis, v):
        c = jnp.cumsum(v, axis=axis)
        n = v.shape[axis]
        zeros_shape = list(v.shape)
        zeros_shape[axis] = r + 1
        last = jnp.take(c, jnp.asarray([n - 1]), axis=axis)
        reps = [1] * v.ndim
        reps[axis] = r
        c = jnp.concatenate(
            [jnp.zeros(zeros_shape, v.dtype), c, jnp.tile(last, reps)],
            axis=axis)
        hi = jnp.take(c, jnp.arange(n) + 2 * r + 1, axis=axis)
        lo = jnp.take(c, jnp.arange(n), axis=axis)
        return hi - lo

    return along(1, along(0, x))


def depth2normal_geo(points, k: int = 31, eps: float = 1e-8):
    """Least-squares plane normals from a camera-space point map.

    Solves, per pixel, min_n ‖A n − 1‖² over the k×k window (A = stacked
    points): n = M⁻¹ s with M = Σ ppᵀ, s = Σ p. Like the reference, the
    result is NOT unit-normalized (callers map (n+1)/2 into RGB).

    Differentiability: this feeds the normal-modality SDS (d normal /
    d depth must exist). Two guards matter there — (1) the 1/det must use
    the double-where trick or the backward is NaN whenever any window is
    exactly singular (0·inf in the where cotangent; this nuked the
    priorN ablation arm within 40 iters), and (2) the singularity floor
    is RELATIVE to the matrix scale ((tr M / 3)³), not an absolute
    1e-12: near-planar windows at small render resolutions otherwise
    produce |n| ~ 10¹ forward values and 1/det² backward blowups.
    Well-posed pixels are bit-identical to the plain solve.

    Args:
      points: [H, W, 3] camera-space point map.
    Returns:
      [H, W, 3] normals.
    """
    p = points
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    # 6 unique entries of ppᵀ + the 3 of p, box-summed in one pass.
    chans = jnp.stack(
        [x * x, x * y, x * z, y * y, y * z, z * z, x, y, z], axis=-1)
    s = _box_sum(chans, k)
    mxx, mxy, mxz, myy, myz, mzz = (s[..., i] for i in range(6))
    sx, sy, sz = s[..., 6], s[..., 7], s[..., 8]

    # Adjugate of the symmetric 3×3 M, det-clamped solve.
    c00 = myy * mzz - myz * myz
    c01 = mxz * myz - mxy * mzz
    c02 = mxy * myz - mxz * myy
    c11 = mxx * mzz - mxz * mxz
    c12 = mxy * mxz - mxx * myz
    c22 = mxx * myy - mxy * mxy
    det = mxx * c00 + mxy * c01 + mxz * c02
    scale3 = ((mxx + myy + mzz) / 3.0) ** 3
    # absolute 1e-12 lower bound keeps the floor a NORMAL f32 (eps·scale3
    # can flush to 0 and then `<=` alone must catch exact-zero dets —
    # all-zero windows happen when k exceeds the map extent)
    floor = jnp.maximum(eps * scale3, 1e-12)
    bad = jnp.abs(det) <= floor
    safe_det = jnp.where(bad, 1.0, det)      # double-where: no 0·inf in bwd
    inv_det = jnp.where(bad, 0.0, 1.0 / safe_det)

    nx = (c00 * sx + c01 * sy + c02 * sz) * inv_det
    ny = (c01 * sx + c11 * sy + c12 * sz) * inv_det
    nz = (c02 * sx + c12 * sy + c22 * sz) * inv_det
    return jnp.stack([nx, ny, nz], axis=-1)


def render_normal_map(depth, K, k: int = 31):
    """depth → [0,1]-mapped normal image (run.py:1437-1443 pipeline)."""
    pts = depth2xyz(depth, K)
    n = depth2normal_geo(pts, k=k)
    return (n + 1.0) / 2.0


def pointcloud_normals(points: "np.ndarray", knn: int = 30) -> "np.ndarray":
    """kNN + SVD point-cloud normals (reference cal_normal_np,
    run.py:2428-2441). Host-side numpy/scipy (cKDTree) — offline utility.

    Args:
      points: [N, 3] numpy point cloud.
    Returns:
      [N, 3] unit normals (smallest-variance directions).
    """
    import numpy as np
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    _, idxs = tree.query(points, k=knn)
    nb = points[idxs]                              # [N, k, 3]
    centered = nb - nb.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered)
    # eigh: ascending eigenvalues → first eigenvector = normal direction
    _, vecs = np.linalg.eigh(cov)
    n = vecs[:, :, 0]
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def field_normals(sigma_fn, pts, eps: float = 0.0):
    """Analytic density-gradient normals: n = −∇σ/‖∇σ‖.

    TPU-native alternative to the reference's raw2outputs_with_normal
    finite-difference variant (run_nerf_helpers.py:409): jax.grad of the
    field's σ head, vmapped over points — exact, one extra backward pass.

    Args:
      sigma_fn: [3] point → scalar σ.
      pts: [..., 3].
    """
    import jax

    g = jax.vmap(jax.grad(sigma_fn))(pts.reshape(-1, 3))
    n = -g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
    return n.reshape(pts.shape)


def estimate_normals_grad(depth):
    """Cheap gradient normals (reference estimate_normals, run.py:2383)."""
    gx = jnp.gradient(depth, axis=1)
    gy = jnp.gradient(depth, axis=0)
    n = jnp.stack([-gx, -gy, jnp.ones_like(depth)], axis=-1)
    return (n + 1.0) / 2.0
