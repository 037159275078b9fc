"""AutoencoderKL (SD VAE) in flax — encoder, decoder, diagonal posterior.

Fresh implementation of the public SD1.x VAE architecture (the reference
uses diffusers' AutoencoderKL for `_encode_vae_image` / latent decode,
pipeline:1051, sd_utils.py:435,450). scaling_factor 0.18215.

The guidance path only needs the ENCODER (differentiable — the SDS gradient
flows render → VAE latents, SURVEY.md §7); the decoder serves the offline
txt2img/inpaint sanity pipeline.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import Downsample2D, ResnetBlock2D, Upsample2D, group_norm

SD_VAE_SCALING = 0.18215


@dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = group_norm(x.shape[-1], eps=1e-6, name="group_norm",
                   dtype=self.dtype)(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        from ..ops.attention import self_attention

        x = self_attention(q, k, v, scale=c ** -0.5)
        x = nn.Dense(c, dtype=self.dtype, name="to_out_0")(x)
        return res + x.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, dtype=self.dtype,
                                  name=f"down_{i}_resnets_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=self.dtype,
                                 name=f"down_{i}_downsamplers_0")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(ch, dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(dtype=self.dtype, name="mid_attentions_0")(h)
        h = ResnetBlock2D(ch, dtype=self.dtype, name="mid_resnets_1")(h)
        h = group_norm(h.shape[-1], eps=1e-6, name="conv_norm_out",
                   dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock2D(ch, dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(dtype=self.dtype, name="mid_attentions_0")(h)
        h = ResnetBlock2D(ch, dtype=self.dtype, name="mid_resnets_1")(h)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(ch, dtype=self.dtype,
                                  name=f"up_{i}_resnets_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Upsample2D(ch, dtype=self.dtype,
                               name=f"up_{i}_upsamplers_0")(h)
        h = group_norm(h.shape[-1], eps=1e-6, name="conv_norm_out",
                   dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode_moments(self, x):
        """[B,H,W,3] in [-1,1] → (mean, logvar) each [B,H/8,W/8,4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Posterior sample (mode when rng is None), scaled by 0.18215."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        return mean * SD_VAE_SCALING

    def decode(self, z):
        """Scaled latents → [B,H,W,3] image in [-1,1]."""
        return self.decoder(self.post_quant_conv(z / SD_VAE_SCALING))

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))
