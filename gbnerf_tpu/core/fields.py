"""Radiance fields: classic NeRF MLP and Instant-NGP hash-grid field.

Parity targets:
  - NeRF MLP (/root/reference/DS_NeRF/run_nerf_helpers.py:75-129): 8×256
    trunk with input-concat skip after layer 4, σ from trunk, RGB from a
    256→(+viewdir PE)→128→3 view branch.
  - NeRF_TCNN (/root/reference/DS_NeRF/run_nerf_helpers_tcnn.py:13-117):
    16-level HashGrid (2 features/level, 2^19 table, base res 16,
    per_level_scale = exp2(log2(2048·bound/16)/15)) → 2×64 σ-net with 15-dim
    geometry feature → SH-degree-4 direction encoding → 3×64 color net.

TPU-first notes: both fields flatten (rays × samples) into one big batch so
every Dense layer is a single large MXU matmul; bfloat16 compute with fp32
params is supported via the ``compute_dtype`` field. The hash-table lookup is
a pure-jnp gather here (XLA lowers to dynamic-gather); ops/hashgrid_pallas.py
provides the Pallas fast path with identical semantics.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoding import freq_encode, sh_encode

FieldFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class NeRFMLP(nn.Module):
    """Original-NeRF MLP with frequency-encoded inputs.

    Output: [..., 4] = rgb logits (3) ⊕ raw σ (1). Activations (sigmoid on
    rgb, relu on σ) are applied downstream in raw2outputs, matching the
    reference split of responsibilities.
    """

    depth: int = 8
    width: int = 256
    skips: Sequence[int] = (4,)
    multires: int = 10          # xyz PE bands (reference --multires)
    multires_views: int = 4     # viewdir PE bands (reference --multires_views)
    use_viewdirs: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, viewdirs, sigma_only: bool = False):
        """pts: [..., 3]; viewdirs: [..., 3] or None → raw [..., 4].

        sigma_only is accepted for FieldFn-contract uniformity; the unused
        color branch is pruned by XLA DCE, so no explicit fast path here.
        """
        del sigma_only
        x = freq_encode(pts.astype(self.compute_dtype), self.multires)
        h = x
        for i in range(self.depth):
            h = nn.Dense(self.width, dtype=self.compute_dtype, name=f"trunk_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)

        if self.use_viewdirs:
            assert viewdirs is not None
            sigma = nn.Dense(1, dtype=self.compute_dtype, name="sigma")(h)
            feat = nn.Dense(self.width, dtype=self.compute_dtype, name="feature")(h)
            v = freq_encode(viewdirs.astype(self.compute_dtype), self.multires_views)
            v = jnp.broadcast_to(v, feat.shape[:-1] + (v.shape[-1],))
            h = jnp.concatenate([feat, v], axis=-1)
            h = nn.relu(nn.Dense(self.width // 2, dtype=self.compute_dtype,
                                 name="views_0")(h))
            rgb = nn.Dense(3, dtype=self.compute_dtype, name="rgb")(h)
            return jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)
        out = nn.Dense(4, dtype=self.compute_dtype, name="output")(h)
        return out.astype(jnp.float32)


def hash_encode(x01, table, base_res: int = 16, per_level_scale: float = 1.3819,
                interpolate: bool = True):
    """Multiresolution hash encoding of points in [0, 1]^3.

    Semantics match tcnn's HashGrid: per level l, resolution
    N_l = floor(base·scale^l); dense linear indexing when the level grid fits
    the table, spatial hash (x ⊕ y·2654435761 ⊕ z·805459861) otherwise;
    trilinear interpolation of the 8 corner features.

    Args:
      x01: [..., 3] points in [0, 1].
      table: [L, T, F] feature table (T a power of two).

    Returns:
      [..., L·F] features.
    """
    L, T, F = table.shape
    outs = []
    # The 8 corner offsets of a voxel, static.
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32
    )  # [8, 3]
    primes = jnp.asarray([1, 2654435761, 805459861], jnp.uint32)
    for lvl in range(L):
        res = int(np.floor(base_res * per_level_scale ** lvl))
        pos = x01 * res
        pos0 = jnp.floor(pos)
        frac = pos - pos0
        idx3 = pos0.astype(jnp.int32)[..., None, :] + corners  # [..., 8, 3]
        if (res + 1) ** 3 <= T:
            stride = jnp.asarray([1, res + 1, (res + 1) ** 2], jnp.uint32)
            idx = jnp.sum(idx3.astype(jnp.uint32) * stride, axis=-1)
        else:
            idx = (
                idx3[..., 0].astype(jnp.uint32) * primes[0]
                ^ idx3[..., 1].astype(jnp.uint32) * primes[1]
                ^ idx3[..., 2].astype(jnp.uint32) * primes[2]
            )
        idx = (idx % jnp.uint32(T)).astype(jnp.int32)  # T power of 2 → AND mask in XLA
        feats = jnp.take(table[lvl], idx, axis=0)  # [..., 8, F]
        if interpolate:
            w = jnp.where(corners[..., :] == 1, frac[..., None, :],
                          1.0 - frac[..., None, :])
            w = jnp.prod(w, axis=-1)  # [..., 8]
            outs.append(jnp.sum(feats * w[..., None], axis=-2))
        else:
            outs.append(feats[..., 0, :])
    return jnp.concatenate(outs, axis=-1)


class HashGridField(nn.Module):
    """Instant-NGP-style field (NeRF_TCNN parity, default config path).

    Output: [..., 4] = rgb logits ⊕ raw σ, same contract as NeRFMLP.
    """

    bound: float = 100.0
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    finest_res_per_unit: int = 2048   # tcnn: 2048 * bound at finest level
    sigma_layers: int = 2
    sigma_width: int = 64
    geo_feat_dim: int = 15
    color_layers: int = 3
    color_width: int = 64
    sh_degree: int = 4
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def per_level_scale(self) -> float:
        return float(
            np.exp2(np.log2(self.finest_res_per_unit * self.bound / self.base_res)
                    / (self.n_levels - 1))
        )

    @nn.compact
    def __call__(self, pts, viewdirs, sigma_only: bool = False):
        del sigma_only  # color branch pruned by XLA DCE when unused
        T = 2 ** self.log2_hashmap_size
        table = self.param(
            "hash_table",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1e-4, 1e-4),
            (self.n_levels, T, self.n_features),
        )
        x01 = (pts + self.bound) / (2.0 * self.bound)
        enc = hash_encode(
            x01.astype(jnp.float32), table.astype(self.compute_dtype),
            base_res=self.base_res, per_level_scale=self.per_level_scale,
        )

        h = enc
        for i in range(self.sigma_layers - 1):
            h = nn.relu(nn.Dense(self.sigma_width, dtype=self.compute_dtype,
                                 use_bias=False, name=f"sigma_{i}")(h))
        h = nn.Dense(1 + self.geo_feat_dim, dtype=self.compute_dtype,
                     use_bias=False, name="sigma_out")(h)
        sigma = h[..., :1]
        geo = h[..., 1:]

        d = sh_encode(viewdirs.astype(self.compute_dtype), self.sh_degree)
        d = jnp.broadcast_to(d, geo.shape[:-1] + (d.shape[-1],))
        h = jnp.concatenate([d, geo], axis=-1)
        for i in range(self.color_layers - 1):
            h = nn.relu(nn.Dense(self.color_width, dtype=self.compute_dtype,
                                 use_bias=False, name=f"color_{i}")(h))
        rgb = nn.Dense(3, dtype=self.compute_dtype, use_bias=False,
                       name="color_out")(h)
        return jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)


def make_frozen_sigma_field_fn(rgb_fn: FieldFn, alpha_fn: FieldFn) -> FieldFn:
    """NeRF_RGB parity: σ from a frozen pretrained field, RGB trains.

    Reference (run_nerf_helpers.py:161-218 ``NeRF_RGB``, run.py:2015-2044):
    with --alpha_model_path a pretrained fine network supplies σ under
    torch.no_grad and only the color model optimizes. Here the frozen field
    is any FieldFn evaluated σ-only under stop_gradient, composed with the
    trainable field's color output — works for the MLP, hash and CP fields
    alike instead of duplicating the module.
    """

    def field_fn(pts, viewdirs, sigma_only: bool = False):
        alpha_raw = jax.lax.stop_gradient(
            alpha_fn(pts, viewdirs, sigma_only=True))
        if sigma_only:
            return alpha_raw
        raw = rgb_fn(pts, viewdirs)
        return jnp.concatenate([raw[..., :3], alpha_raw[..., 3:4]], axis=-1)

    return field_fn


def make_field_fn(model: nn.Module, params) -> FieldFn:
    """Close a flax field over params → FieldFn for render_rays.

    Broadcasts per-ray viewdirs over the sample axis and flattens
    (rays × samples) so the MLP runs as one large MXU batch.
    """

    def field_fn(pts, viewdirs, sigma_only: bool = False):
        # viewdirs stay per-ray ([..., 1, 3] vs pts [..., S, 3]): fields
        # encode directions at ray granularity and broadcast the (much
        # smaller) encoding over the sample axis, not the raw dirs.
        vd = viewdirs[..., None, :] if viewdirs is not None else None
        raw = model.apply({"params": params}, pts, vd, sigma_only=sigma_only)
        return raw

    return field_fn
