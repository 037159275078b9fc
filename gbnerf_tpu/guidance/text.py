"""CLIP text encoder (flax) + tokenizer wrapper.

The reference encodes prompts through diffusers' CLIPTextModel
(pipeline:579-830), including the CSD triple (null ⊕ uncond ⊕ text,
pipeline:613-830 concat order at :608). Here:

  - `CLIPTextEncoder`: fresh flax ViT-L/14 text tower (12 layers, width 768,
    quick-GELU, causal mask, final LN) — SD1.x consumes last_hidden_state.
  - `Tokenizer`: wraps transformers' CLIPTokenizer when vocab files are
    available locally (no network in this environment); otherwise a
    deterministic hash fallback so the full pipeline stays runnable/testable
    without downloads.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=1000, width=32, layers=2, heads=2)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(name="layer_norm1", dtype=self.dtype)(x)
        d = c.width // c.heads
        q = nn.Dense(c.width, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(c.width, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(c.width, dtype=self.dtype, name="v_proj")(h)
        b, n, _ = q.shape
        q = q.reshape(b, n, c.heads, d)
        k = k.reshape(b, n, c.heads, d)
        v = v.reshape(b, n, c.heads, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5) + mask
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c.width)
        x = x + nn.Dense(c.width, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(name="layer_norm2", dtype=self.dtype)(x)
        h = nn.Dense(c.width * 4, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.width, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        """[B, L] token ids → last_hidden_state [B, L, width]."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_length, c.width))
        x = tok + pos[None, :input_ids.shape[1]].astype(self.dtype)
        L = input_ids.shape[1]
        causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)[None, None]
        for i in range(c.layers):
            x = CLIPLayer(c, self.dtype, name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(name="final_layer_norm", dtype=self.dtype)(x)


class Tokenizer:
    """CLIP BPE tokenizer with a deterministic no-vocab fallback."""

    BOS, EOS = 49406, 49407  # real CLIP vocab; scaled for tiny test vocabs

    def __init__(self, vocab_dir: Optional[str] = None,
                 max_length: int = 77, vocab_size: int = 49408):
        self.max_length = max_length
        self.vocab_size = vocab_size
        self.bos = self.BOS if vocab_size > self.BOS else vocab_size - 2
        self.eos = self.EOS if vocab_size > self.EOS else vocab_size - 1
        self._hf = None
        if vocab_dir:
            # An EXPLICIT vocab_dir that fails to load must raise, not fall
            # back: the hash fallback would silently turn every prompt into
            # garbage conditioning in a real-weights run (a distillation run
            # would quietly train against meaningless text embeddings).
            from transformers import CLIPTokenizer

            try:
                self._hf = CLIPTokenizer.from_pretrained(vocab_dir)
            except Exception as e:
                raise RuntimeError(
                    f"tokenizer vocab_dir={vocab_dir!r} was given but "
                    f"CLIPTokenizer failed to load from it: {e!r}. Refusing "
                    "the hash fallback — it would silently replace real "
                    "prompts with meaningless ids. Fix the vocab dir or "
                    "pass vocab_dir=None to opt into the fallback.") from e

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        if self._hf is not None:
            out = self._hf(list(texts), padding="max_length",
                           max_length=self.max_length, truncation=True,
                           return_tensors="np")
            return out["input_ids"].astype(np.int32)
        return np.stack([self._fallback(t) for t in texts])

    def _fallback(self, text: str) -> np.ndarray:
        """Deterministic per-word hashing into the vocab (no real BPE).

        Keeps the whole guidance stack runnable without vocab files: the
        mapping is stable, distinct words get (almost surely) distinct ids,
        and the empty prompt maps to BOS/EOS padding exactly like real CLIP.
        """
        import hashlib

        ids = [self.bos]
        for w in text.lower().split()[: self.max_length - 2]:
            h = int.from_bytes(
                hashlib.md5(w.encode("utf-8")).digest()[:4], "little")
            ids.append(h % (self.vocab_size - 3) + 1)
        ids.append(self.eos)
        ids += [self.eos] * (self.max_length - len(ids))
        return np.asarray(ids[: self.max_length], np.int32)
