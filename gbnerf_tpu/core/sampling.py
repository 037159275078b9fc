"""Ray sampling: stratified coarse samples and inverse-CDF importance sampling.

Parity targets:
  - stratified/lindisp/perturb z-value generation: render_rays
    (/root/reference/run.py:2291-2315)
  - sample_pdf inverse-CDF resampling (/root/reference/DS_NeRF/
    run_nerf_helpers.py:306-349) — the reference's only native-kernel-backed
    op (torchsearchsorted, SURVEY.md §2.1).

TPU-first design: the searchsorted step is NOT a binary search here. For
N_bins ≈ 65 a dense comparison matrix (cdf[..., None, :] <= u[..., :, None])
reduced along the bin axis is a handful of fused VPU ops with perfect layout —
no gather, no sort, no data-dependent control flow. A fused Pallas kernel
(ops/resample.py) implements the same contract for large sample counts; this
jnp version is the oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(near, far, N_samples: int, *, lindisp: bool = False,
                      perturb: bool = False, rng=None, dtype=jnp.float32):
    """Coarse z values: linear in depth or in disparity, optionally jittered.

    Args:
      near, far: [..., 1] (or scalar) per-ray bounds.
      N_samples: static sample count.
      perturb: if True, stratified-jitter each interval with `rng`.

    Returns:
      z_vals: [..., N_samples].
    """
    t = jnp.linspace(0.0, 1.0, N_samples, dtype=dtype)
    near = jnp.asarray(near, dtype)
    far = jnp.asarray(far, dtype)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    if perturb:
        assert rng is not None, "perturb=True requires an rng key"
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], -1)
        lower = jnp.concatenate([z[..., :1], mids], -1)
        t_rand = jax.random.uniform(rng, z.shape, dtype=dtype)
        z = lower + (upper - lower) * t_rand
    return z


def searchsorted_right(a, v):
    """Batched row-wise ``searchsorted(..., right=True)``.

    For each row: index i such that a[..., i-1] <= v < a[..., i].
    Dense-comparison formulation (VPU-friendly, no gather/scan):
    i = #{j : a[..., j] <= v}.

    Args:
      a: [..., N] sorted along last axis.
      v: [..., M] query values.
    Returns:
      [..., M] int32 indices in [0, N].
    """
    return jnp.sum(
        (a[..., None, :] <= v[..., :, None]).astype(jnp.int32), axis=-1
    )


def sample_pdf(bins, weights, N_samples: int, *, det: bool = False, rng=None,
               eps: float = 1e-5, u=None):
    """Inverse-CDF importance sampling of ``N_samples`` new z values.

    Matches the reference sample_pdf contract exactly (weights + 1e-5,
    prepend-zero CDF, right-searchsorted, clamped below/above gather, lerp
    with denom<1e-5 → 1).

    Args:
      bins: [..., N_bins] sample-interval midpoints (sorted).
      weights: [..., N_bins - 1] unnormalized interval weights.
      det: deterministic (linspace) u values instead of uniform draws.
      u: optional [..., N_samples] explicit uniforms — the golden-test seam,
        mirroring the reference's ``pytest=`` flag that overwrites u with
        seeded numpy draws (run_nerf_helpers.py:320-329).

    Returns:
      samples: [..., N_samples] (gradient-stopped by callers as in the ref).
    """
    dtype = bins.dtype
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., N_bins]

    batch_shape = cdf.shape[:-1]
    if u is not None:
        u = jnp.broadcast_to(jnp.asarray(u, dtype), batch_shape + (N_samples,))
    elif det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, N_samples, dtype=dtype), batch_shape + (N_samples,)
        )
    else:
        assert rng is not None, "stochastic sample_pdf requires an rng key"
        u = jax.random.uniform(rng, batch_shape + (N_samples,), dtype=dtype)

    inds = searchsorted_right(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_z_vals(z_vals, z_samples):
    """Sorted union of coarse and importance z values (fine-pass input).

    Parity: run.py:2348 ``sort(cat(z_vals, z_samples))``.
    """
    return jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
