"""Pallas TPU kernel: fused CP-grid encoding (triangle-kernel interp on MXU).

Two design steps beyond the naive two-hot formulation (see git history):

1. **Nested resolutions, unified lines.** With R_l − 1 all dividing
   R_max − 1 (e.g. 17, 33, 65, 129, 257), every coarse level's piecewise-
   linear interpolant is EXACTLY representable on the finest grid. Each
   axis's lines upsample (linearly, outside the kernel, differentiable) to a
   single [R_max, L·rank] matrix — so one weight matrix per axis serves all
   levels, and the MXU contraction output is L·rank (≈80) lanes wide instead
   of rank (16).

2. **Triangle weights.** The linear-interp row is relu(1 − |pos − u|):
   3 VPU ops per element, no integer compares, generated in VMEM and fed
   straight to the MXU. HBM traffic is points in + features out only.

Backward (training-only, small batches) runs the identical XLA formulation
through custom_vjp; gradients flow to the per-level lines through the
upsampling matmul.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512

NESTED_RESOLUTIONS = (17, 33, 65, 129, 257)


def check_nested(resolutions: Sequence[int]) -> int:
    r_max = max(resolutions)
    for r in resolutions:
        assert (r_max - 1) % (r - 1) == 0, (
            f"resolutions must nest: ({r_max}-1) % ({r}-1) != 0; "
            f"use e.g. {NESTED_RESOLUTIONS}")
    return r_max


def upsample_lines(lines: Sequence[jnp.ndarray], r_max: int) -> jnp.ndarray:
    """Per-level [3, R_l, rank] → unified [3, R_max, L·rank] (exact PWL).

    Differentiable; the per-level → fine-grid map is a static sparse matmul.
    """
    outs = []
    for line3 in lines:
        R = line3.shape[1]
        if R == r_max:
            outs.append(line3)
            continue
        # fine node p sits at coarse coordinate p·(R−1)/(R_max−1)
        u = np.arange(r_max) * (R - 1) / (r_max - 1)
        i0 = np.floor(u).astype(np.int32)
        f = (u - i0).astype(np.float32)
        pos = np.arange(R)
        W = ((pos[None] == i0[:, None]) * (1 - f[:, None])
             + (pos[None] == np.minimum(i0[:, None] + 1, R - 1)) * f[:, None])
        W = jnp.asarray(W, jnp.float32)                     # [R_max, R]
        outs.append(jnp.einsum("mr,ark->amk", W, line3))
    return jnp.concatenate(outs, axis=-1)                   # [3, R_max, L·rank]


def _kernel(x_ref, ulines_ref, out_ref, *, r_max: int, feat_dim: int):
    x = x_ref[:]                                            # [TILE, 3]
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (TILE, r_max), 1).astype(jnp.float32)
    prod = None
    for axis in range(3):
        u = jnp.clip(x[:, axis], 0.0, 1.0) * (r_max - 1)
        w = jnp.maximum(1.0 - jnp.abs(pos - u[:, None]), 0.0)  # triangle
        fa = jnp.dot(w.astype(jnp.bfloat16),
                     ulines_ref[axis].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)       # [TILE, L·rank]
        prod = fa if prod is None else prod * fa
    out_ref[:] = prod


def _fwd_impl(x01, ulines, r_max: int):
    n, feat_dim = x01.shape[0], ulines.shape[-1]
    ntiles = -(-n // TILE)
    pad = ntiles * TILE - n
    xp = jnp.pad(x01, ((0, pad), (0, 0))) if pad else x01
    kernel = functools.partial(_kernel, r_max=r_max, feat_dim=feat_dim)
    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r_max, feat_dim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, feat_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles * TILE, feat_dim), jnp.float32),
    )(xp, ulines)
    return out[:n] if pad else out


def _xla_impl(x01, ulines, r_max: int):
    """Identical math in XLA (oracle + backward)."""
    pos = jnp.arange(r_max, dtype=jnp.float32)
    prod = None
    for axis in range(3):
        u = jnp.clip(x01[:, axis], 0.0, 1.0) * (r_max - 1)
        w = jnp.maximum(1.0 - jnp.abs(pos[None] - u[:, None]), 0.0)
        fa = jnp.dot(w.astype(jnp.bfloat16), ulines[axis].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        prod = fa if prod is None else prod * fa
    return prod


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cp_encode_unified(x01, ulines, r_max: int):
    """Fused CP encoding on unified lines: [N,3] × [3,R_max,F] → [N,F]."""
    return _fwd_impl(x01, ulines, r_max)


def _fwd(x01, ulines, r_max):
    return _fwd_impl(x01, ulines, r_max), (x01, ulines)


def _bwd(r_max, res, g):
    x01, ulines = res
    _, vjp = jax.vjp(lambda x, l: _xla_impl(x, l, r_max), x01, ulines)
    return vjp(g)


cp_encode_unified.defvjp(_fwd, _bwd)


def cp_encode_fused(x01, lines: Sequence[jnp.ndarray], *, use_pallas=False):
    """High-level entry: per-level lines → features (nested resolutions).

    use_pallas=False by default: measured on v5e, XLA pipelines the unified
    triangle-matmul slightly better than the hand-written kernel
    (302 vs 259 M pts/s) and is differentiable without a custom backward.
    The Pallas kernel is kept as the tuning vehicle for future work
    (smaller tiles / bf16 masks / fused σ-MLP)."""
    resolutions = [l.shape[1] for l in lines]
    r_max = check_nested(resolutions)
    ulines = upsample_lines(lines, r_max)
    if use_pallas:
        return cp_encode_unified(x01, ulines, r_max)
    return _xla_impl(x01, ulines, r_max)
