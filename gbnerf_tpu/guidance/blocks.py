"""Shared flax building blocks for the diffusion models (UNet / VAE).

Fresh flax implementations of the standard Stable-Diffusion v1.x
architecture pieces (ResNet block, spatial transformer with self/cross
attention, GEGLU feed-forward, up/down sampling, sinusoidal time
embeddings). The reference consumes these via HF diffusers
(/root/reference/DS_NeRF/pipelines/stable_diffusion_inpainting_pipeline.py);
we implement them natively for TPU: NHWC layout (XLA's preferred conv
layout), bfloat16 compute with fp32 params, attention as plain batched
matmuls that XLA maps onto the MXU.

Param naming mirrors diffusers' module paths so weights/weights.py can map
torch checkpoints 1:1.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def group_norm(channels: int, groups: int = 32, *, eps: float = 1e-5,
               name: str = "norm", dtype=None):
    """GroupNorm with group count clamped to divide tiny test channels
    (real SD channels are all multiples of 32 — no behavior change).

    `dtype` must be threaded from the caller's compute dtype: with the
    flax default (None) the f32 params promote the OUTPUT to f32, so the
    following SiLU runs f32 and the autodiff residuals saved for the
    backward are f32 — 2× the HBM traffic (traced as the VAE-bwd copy
    storm). Statistics stay f32 either way
    (force_float32_reductions=True default); bf16 stats measured NEUTRAL
    (66.0 vs 65.8 ms full guidance step), so only the output dtype is
    controlled here.
    """
    g = groups if channels % groups == 0 else channels
    return nn.GroupNorm(g, epsilon=eps, name=name, dtype=dtype)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       dtype=jnp.float32):
    """Sinusoidal timestep embedding, diffusers convention
    (flip_sin_to_cos=True → [cos, sin] order, freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = jnp.asarray(t, jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1).astype(dtype)


class TimestepEmbedding(nn.Module):
    """time_proj → linear_1 → silu → linear_2 (320 → 1280 for SD1.x)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(emb)


class ResnetBlock2D(nn.Module):
    """GN→SiLU→Conv + time-emb add + GN→SiLU→Conv, 1×1 shortcut on C change."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        h = group_norm(x.shape[-1], self.groups, eps=self.eps, name="norm1",
                       dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            temb = nn.Dense(self.out_channels, dtype=self.dtype,
                            name="time_emb_proj")(nn.silu(temb))
            h = h + temb[:, None, None, :]
        h = group_norm(h.shape[-1], self.groups, eps=self.eps, name="norm2",
                       dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention (self when context is None, else cross).

    q/k/v projections without bias, out projection with bias — SD1.x
    convention. Softmax in fp32 for stability; the QK/AV contractions are
    single large matmuls (MXU).
    """

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)

        scale = self.dim_head ** -0.5
        if mask is None:
            # Fused Pallas path for long self-attention (falls back to the
            # XLA oracle for cross/short/misaligned — ops/attention.py).
            from ..ops.attention import self_attention

            out = self_attention(q.transpose(0, 2, 1, 3),
                                 k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), scale=scale)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
            return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = attn + mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    """GEGLU 4× expansion (diffusers ff.net.0 / ff.net.2)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * 4, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn → LN→cross-attn → LN→GEGLU-FF, all residual."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        x = x + Attention(self.heads, self.dim_head, self.dtype,
                          name="attn1")(h)
        h = nn.LayerNorm(name="norm2", dtype=self.dtype)(x)
        x = x + Attention(self.heads, self.dim_head, self.dtype,
                          name="attn2")(h, context)
        h = nn.LayerNorm(name="norm3", dtype=self.dtype)(x)
        return x + FeedForward(self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer: GN → 1×1 conv in → N blocks → 1×1 conv out."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = group_norm(x.shape[-1], eps=1e-6, name="norm", dtype=self.dtype)(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(self.heads, self.dim_head, self.dtype,
                                      name=f"transformer_blocks_{i}")(x, context)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample2D(nn.Module):
    """Stride-2 3×3 downsampling conv.

    Padding parity with diffusers' Downsample2D: the VAE encoder uses
    ASYMMETRIC (0,1) padding (AutoencoderKL passes downsample_padding=0,
    triggering F.pad(x, (0,1,0,1))); the UNet's down blocks use SYMMETRIC
    padding=1. Both are expressed INSIDE the conv op — an explicit
    jnp.pad + VALID conv is numerically identical but costs 1.75× in the
    BACKWARD pass on TPU (the materialized pad/slice pair breaks XLA's
    conv layout assignment; measured tools/exp_vae3.py E_jnp_pad 15.7 vs
    E_conv_pad 9.0 ms fwd+bwd on the encoder skeleton).
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    asymmetric: bool = True   # VAE default; UNet passes False

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric else ((1, 1), (1, 1))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=pad, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv")(x)
