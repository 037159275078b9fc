"""Volume rendering: alpha compositing and the coarse/fine render pipeline.

Parity targets:
  - raw2outputs (/root/reference/DS_NeRF/run_nerf_helpers.py:352-406):
    α = 1 − exp(−relu(σ + noise)·δ·|d|), exclusive-cumprod transmittance,
    weighted RGB/depth/disp/acc, white background, 1e10 terminal interval.
  - render_rays (/root/reference/run.py:2235-2381): stratified coarse pass →
    inverse-CDF fine resampling → second field eval → composite.
  - render()/batchify_rays chunking (/root/reference/run.py:1624-1748) —
    replaced by ``lax.map`` over fixed-size ray blocks: XLA compiles ONE block
    program and loops it on-device, so arbitrarily large images render inside
    a single jit with bounded VMEM/HBM working set.

TPU-first: the whole coarse+fine pipeline is one jit region — field matmuls
hit the MXU, compositing fuses into the surrounding elementwise stream; no
host synchronization inside the loop.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .sampling import merge_z_vals, sample_pdf, stratified_z_vals


class RenderOutputs(NamedTuple):
    """Per-ray composited maps (fine pass unless noted)."""

    rgb: jnp.ndarray            # [..., 3]
    disp: jnp.ndarray           # [...]
    acc: jnp.ndarray            # [...]
    depth: jnp.ndarray          # [...]
    weights: jnp.ndarray        # [..., S]
    z_vals: jnp.ndarray         # [..., S]
    alpha: jnp.ndarray          # [..., S]
    rgb0: Optional[jnp.ndarray] = None   # coarse maps (when two-pass)
    disp0: Optional[jnp.ndarray] = None
    acc0: Optional[jnp.ndarray] = None
    depth0: Optional[jnp.ndarray] = None
    z_std: Optional[jnp.ndarray] = None


def raw2outputs(raw, z_vals, rays_d, *, raw_noise_std: float = 0.0, rng=None,
                white_bkgd: bool = False, detach_weights: bool = False):
    """Composite raw field predictions into per-ray maps.

    Args:
      raw: [..., S, 4] field output (rgb logits ⊕ σ).
      z_vals: [..., S] sample depths.
      rays_d: [..., 3] (un-normalized) ray directions — δ is scaled by |d| so
        z stays in "units of d" while α uses metric length.

    Returns:
      (rgb_map [..., 3], disp_map, acc_map, weights [..., S],
       depth_map, alpha [..., S])
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        assert rng is not None, "raw_noise_std > 0 requires an rng key"
        sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    # Exclusive cumprod of transmittance: T_i = prod_{j<i} (1 - α_j + 1e-10).
    # On TPU this runs as exp∘cumsum∘log with the cumsum as one triangular
    # MXU matmul — XLA's native cumprod costs ~0.5 ms at [16k,128]
    # (ops/scan.py; measured ~3.6x total raw2outputs speedup).
    from ..ops.scan import cumprod_last_exclusive

    trans = cumprod_last_exclusive(1.0 - alpha, eps=1e-10)
    weights = alpha * trans
    w = jax.lax.stop_gradient(weights) if detach_weights else weights

    rgb_map = jnp.sum(w[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    # Expected disparity given termination. Documented divergence from the
    # reference's 1/max(1e-10, depth/acc): that form explodes to 1e10 on empty
    # rays (acc→0), poisoning the disparity-supervision MSE with ~1e20 terms
    # early in training. We clamp to the physical maximum 1/z_near — identical
    # on occupied rays, finite on empty ones.
    z_near = z_vals[..., 0]
    disp_map = jnp.minimum(
        1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10)),
        1.0 / jnp.maximum(z_near, 1e-10),
    )
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map, alpha


# A field function maps ([..., 3] points, [..., 3] viewdirs) -> [..., 4] raw.
FieldFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def render_rays(
    coarse_fn: FieldFn,
    fine_fn: Optional[FieldFn],
    rays_o, rays_d, viewdirs, near, far,
    *,
    N_samples: int,
    N_importance: int = 0,
    lindisp: bool = False,
    perturb: bool = False,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    detach_weights: bool = False,
    rng=None,
    fast_resample: bool = True,
    coarse_sigma_only: bool = False,
) -> RenderOutputs:
    """Hierarchical coarse→fine volume render of a ray batch.

    One jit-region pipeline replacing render_rays + network_query_fn chunking.

    Args:
      coarse_fn / fine_fn: field closures over params (see fields.py). If
        ``fine_fn`` is None the coarse field is reused for the fine pass
        (reference run.py:2352 ``run_fn = network_fn if network_fine is None``).
      rays_o, rays_d: [N, 3]; viewdirs: [N, 3] unit directions.
      near, far: [N, 1] bounds.

    Returns:
      RenderOutputs with fine maps (coarse maps in rgb0/... when two-pass).
    """
    k_strat, k_noise0, k_pdf, k_noise1 = (
        jax.random.split(rng, 4) if rng is not None else (None,) * 4
    )

    z_vals = stratified_z_vals(
        near, far, N_samples, lindisp=lindisp, perturb=perturb, rng=k_strat,
        dtype=rays_o.dtype,
    )
    z_vals = jnp.broadcast_to(z_vals, rays_o.shape[:-1] + (N_samples,))

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    # σ-only coarse: at eval the coarse rgb0 maps are unused; the fused
    # Pallas field can't rely on XLA DCE, so the skip is explicit.
    raw = coarse_fn(pts, viewdirs,
                    sigma_only=coarse_sigma_only and N_importance > 0)
    rgb, disp, acc, weights, depth, alpha = raw2outputs(
        raw, z_vals, rays_d, raw_noise_std=raw_noise_std, rng=k_noise0,
        white_bkgd=white_bkgd, detach_weights=detach_weights,
    )

    if N_importance <= 0:
        return RenderOutputs(rgb, disp, acc, depth, weights, z_vals, alpha)

    rgb0, disp0, acc0, depth0 = rgb, disp, acc, depth
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    if fast_resample:
        # Gather-free inverse CDF with directly-sorted uniforms + sortless
        # merge (ops/resample.py) — exact drop-in for the oracle below, no
        # gathers or bitonic sorts in the hot path.
        from ..ops.resample import merge_sorted_fast, sample_pdf_fast

        z_samples = sample_pdf_fast(
            z_mid, jax.lax.stop_gradient(weights[..., 1:-1]), N_importance,
            det=not perturb, rng=k_pdf, sorted_u=True,
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_all = merge_sorted_fast(z_vals, z_samples)
    else:
        z_samples = sample_pdf(
            z_mid, jax.lax.stop_gradient(weights[..., 1:-1]), N_importance,
            det=not perturb, rng=k_pdf,
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_all = merge_z_vals(z_vals, z_samples)

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
    raw = (fine_fn or coarse_fn)(pts, viewdirs)
    rgb, disp, acc, weights, depth, alpha = raw2outputs(
        raw, z_all, rays_d, raw_noise_std=raw_noise_std, rng=k_noise1,
        white_bkgd=white_bkgd, detach_weights=detach_weights,
    )
    z_std = jnp.std(z_samples, axis=-1)
    return RenderOutputs(
        rgb, disp, acc, depth, weights, z_all, alpha,
        rgb0=rgb0, disp0=disp0, acc0=acc0, depth0=depth0, z_std=z_std,
    )


def render_rays_blocked(render_fn: Callable[[Any], Any], rays: Any,
                        block_size: int = 8192):
    """Apply a per-ray-batch render over a large flat ray set via lax.map.

    Replaces the reference's ``batchify_rays`` python chunk loop
    (run.py:1656-1669). The ray pytree's leading axis is padded to a multiple
    of ``block_size``, reshaped to [num_blocks, block_size, ...], and mapped —
    XLA compiles the block program once; the on-device loop bounds memory.

    Args:
      render_fn: function of a ray pytree slice [block_size, ...].
      rays: pytree of arrays with identical leading dim N.

    Returns:
      pytree of outputs with leading dim N (padding stripped).
    """
    leaves = jax.tree_util.tree_leaves(rays)
    n = leaves[0].shape[0]
    nblocks = -(-n // block_size)
    pad = nblocks * block_size - n

    def blockify(x):
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0) if pad else x
        return x.reshape((nblocks, block_size) + x.shape[1:])

    blocked = jax.tree_util.tree_map(blockify, rays)
    out = jax.lax.map(render_fn, blocked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((nblocks * block_size,) + x.shape[2:])[:n], out
    )
