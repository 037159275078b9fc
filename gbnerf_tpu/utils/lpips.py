"""LPIPS perceptual distance in flax (VGG16 feature space).

The reference builds `lpips.LPIPS(net='vgg')` for masked patch supervision
(/root/reference/run.py:710-714, flags :416,435-440). This is a fresh flax
VGG16 with the standard LPIPS recipe: per-layer unit-normalized feature
differences, spatially averaged, summed over the 5 conv stages with learned
(or uniform) per-channel weights.

Without torchvision weights on disk the features are a random-convnet
perceptual proxy — still a structured multi-scale distance (random VGGs are
a known usable perceptual metric), exact LPIPS when weights are provided via
`load_vgg16_npz`.
"""
from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512)
STAGE_ENDS = (1, 3, 6, 9, 12)  # conv indices ending each LPIPS stage


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """[B, H, W, 3] in [0,1] → 5 feature stages."""
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        h = (x - mean) / std
        feats, conv_i = [], 0
        for v in VGG16_CFG:
            if v == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                continue
            h = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_{conv_i}")(h)
            h = nn.relu(h)
            if conv_i in STAGE_ENDS:
                feats.append(h)
            conv_i += 1
        return feats


class LPIPS:
    def __init__(self, rng, weights: Optional[dict] = None):
        self.net = VGG16Features()
        self.lins = None
        if weights is not None:
            weights = dict(weights)
            # learned per-channel stage weights (lpips-package lin heads,
            # converted by tools/convert_vgg.py) ride alongside the conv
            # params as top-level lin_{k} vectors
            lins = [weights.pop(f"lin_{k}", None) for k in range(5)]
            if all(l is not None for l in lins):
                self.lins = [jnp.asarray(l) for l in lins]
            self.params = weights
        else:
            self.params = jax.jit(self.net.init)(
                rng, jnp.zeros((1, 64, 64, 3)))["params"]

    MIN_SIZE = 32  # below this, the 4 max-pools collapse stages to 0×0
                   # (empty-mean → NaN); tiny patches are upsampled first

    def __call__(self, a, b):
        """Perceptual distance between [B, H, W, 3] images in [0, 1]."""
        if a.shape[1] < self.MIN_SIZE or a.shape[2] < self.MIN_SIZE:
            shape = (a.shape[0], max(a.shape[1], self.MIN_SIZE),
                     max(a.shape[2], self.MIN_SIZE), a.shape[3])
            a = jax.image.resize(a, shape, "bilinear")
            b = jax.image.resize(b, shape, "bilinear")
        fa = self.net.apply({"params": self.params}, a)
        fb = self.net.apply({"params": self.params}, b)
        total = 0.0
        for k, (x, y) in enumerate(zip(fa, fb)):
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
            y = y / jnp.maximum(
                jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
            d2 = (x - y) ** 2
            if self.lins is not None:
                # standard LPIPS: 1×1 conv with learned non-negative
                # per-channel weights, then spatial mean
                total = total + jnp.mean(jnp.sum(self.lins[k] * d2, -1),
                                         axis=(1, 2))
            else:
                # uniform fallback (documented approximation): channel mean
                total = total + jnp.mean(d2, axis=(1, 2, 3))
        return total


def load_vgg16_npz(path: str) -> dict:
    """Load converted VGG16 weights (tools/convert_vgg.py npz:
    conv_{i}/kernel, conv_{i}/bias, optional flat lin_{k} stage vectors)."""
    import numpy as np

    data = np.load(path)
    params = {}
    for key in data.files:
        if "/" not in key:                 # lin_{k} stage-weight vectors
            params[key] = jnp.asarray(data[key])
            continue
        name, leaf = key.rsplit("/", 1)
        params.setdefault(name, {})[leaf] = jnp.asarray(data[key])
    return params
