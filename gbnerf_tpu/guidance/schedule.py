"""Diffusion noise schedule (DDPM/DDIM math for Stable Diffusion v1.x).

Parity targets:
  - diffusers DDIMScheduler/PNDMScheduler state used by the reference:
    scaled-linear betas 0.00085→0.012 over 1000 train steps,
    alphas_cumprod (sd_utils.py:129-139), `add_noise`
    (x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε), SDS weighting w(t) = 1−ᾱ_t
    (sd_utils.py:501-505).
  - timestep range slicing: min/max step = t_range · num_train_timesteps
    (sd_utils.py:129-131), annealed t(i) = max − (max−min)·√(i/anneal)
    (sd_utils.py:444, normal variant :267).

Pure jnp dataclass — schedule arrays are device constants baked into the jit.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DiffusionSchedule:
    num_train_timesteps: int
    betas: np.ndarray            # [T]
    alphas_cumprod: np.ndarray   # [T]

    @staticmethod
    def sd_v1(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
              beta_end: float = 0.012) -> "DiffusionSchedule":
        """The SD v1.x 'scaled_linear' schedule."""
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
        alphas_cumprod = np.cumprod(1.0 - betas)
        return DiffusionSchedule(num_train_timesteps, betas.astype(np.float32),
                                 alphas_cumprod.astype(np.float32))

    def add_noise(self, x0, noise, t):
        """x_t = √ᾱ_t x₀ + √(1−ᾱ_t) ε  (t: int scalar or [B])."""
        ac = jnp.asarray(self.alphas_cumprod)[t]
        while ac.ndim < x0.ndim:
            ac = ac[..., None]
        return jnp.sqrt(ac) * x0 + jnp.sqrt(1.0 - ac) * noise

    def sds_weight(self, t):
        """w(t) = 1 − ᾱ_t (the reference's grad scale, sd_utils.py:501)."""
        return 1.0 - jnp.asarray(self.alphas_cumprod)[t]

    def step_range(self, t_range: Tuple[float, float]) -> Tuple[int, int]:
        return (int(self.num_train_timesteps * t_range[0]),
                int(self.num_train_timesteps * t_range[1]))

    def annealed_t(self, i, t_range: Tuple[float, float],
                   anneal_iters: int = 20000):
        """t(i) = max − (max−min)·√(i / anneal_iters), clipped ≥ min."""
        mn, mx = self.step_range(t_range)
        frac = jnp.sqrt(jnp.minimum(
            jnp.asarray(i, jnp.float32) / float(anneal_iters), 1.0))
        t = mx - (mx - mn) * frac
        return jnp.clip(t.astype(jnp.int32), mn, mx)

    def ddim_step(self, x_t, eps, t, t_prev, eta: float = 0.0):
        """One deterministic DDIM update x_t → x_{t_prev}."""
        ac = jnp.asarray(self.alphas_cumprod)
        a_t = ac[t]
        a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (x_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev) * eps
        return jnp.sqrt(a_prev) * x0 + dir_xt
