"""Image losses and metrics (reference run_nerf_helpers.py:15-21)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def img2l1(x, y):
    return jnp.mean(jnp.abs(x - y))


def img2mse_mask(x, y, mask):
    """Mask-weighted MSE (reference img2mse_mask, mask squared weighting)."""
    return jnp.mean((x - y) * mask ** 2)


def weighted_mse(x, y, w):
    """Error-weighted MSE used for COLMAP sparse-depth supervision."""
    return jnp.mean(w * (x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)
