"""Guidance orchestration: view sampling + progressive ranges.

Parity with Pretrain_Model (/root/reference/DS_NeRF/nerf/utils.py:174-319):
holds the guidance dict, samples random orbit poses for azimuth conditioning
(rand_poses, :102-168), progressively widens the sampled view range
(:264-273), and dispatches modality losses (cal_loss → make_guidance_fn in
stable.py).

The azimuth feeds directional prompt conditioning (front/side/back text
variants via Perp-Neg); GB-NeRF's shipped config doesn't use directional
prompts, so this module provides the capability surface with the same knobs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def rand_poses(rng, size: int, *, radius_range=(1.0, 1.5),
               theta_range=(0.0, 120.0), phi_range=(0.0, 360.0),
               angle_overhead: float = 30.0, angle_front: float = 60.0):
    """Random orbit camera poses on a spherical shell around the origin.

    Returns (poses [size, 4, 4], dirs [size] view-direction class ids,
    thetas, phis, radii) — capability parity with nerf/utils.py:102-168.
    Direction classes: 0 front, 1 side, 2 back, 3 side, 4 top, 5 bottom.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    to_rad = np.pi / 180.0
    thetas = jax.random.uniform(k1, (size,), minval=theta_range[0] * to_rad,
                                maxval=theta_range[1] * to_rad)
    phis = jax.random.uniform(k2, (size,), minval=phi_range[0] * to_rad,
                              maxval=phi_range[1] * to_rad)
    radii = jax.random.uniform(k3, (size,), minval=radius_range[0],
                               maxval=radius_range[1])

    centers = jnp.stack([
        radii * jnp.sin(thetas) * jnp.sin(phis),
        radii * jnp.cos(thetas),
        radii * jnp.sin(thetas) * jnp.cos(phis),
    ], axis=-1)

    forward = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), forward.shape)
    right = jnp.cross(up, forward)
    right = right / jnp.maximum(
        jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-8)
    up2 = jnp.cross(forward, right)

    poses = jnp.zeros((size, 4, 4)).at[:, 3, 3].set(1.0)
    poses = poses.at[:, :3, 0].set(right)
    poses = poses.at[:, :3, 1].set(up2)
    poses = poses.at[:, :3, 2].set(forward)
    poses = poses.at[:, :3, 3].set(centers)

    # view-direction class from (theta, phi)
    ao, af = angle_overhead * to_rad, angle_front * to_rad
    phis_w = jnp.mod(phis, 2 * np.pi)
    dirs = jnp.where(
        thetas <= ao, 4,
        jnp.where(thetas >= np.pi - ao, 5,
                  jnp.where((phis_w < af / 2) | (phis_w > 2 * np.pi - af / 2), 0,
                            jnp.where(jnp.abs(phis_w - np.pi) < af / 2, 2,
                                      jnp.where(phis_w < np.pi, 1, 3)))))
    return poses, dirs, thetas, phis, radii


def progressive_ranges(step_i, gcfg, n_iters: int):
    """jit-safe per-step view ranges (reference nerf/utils.py:264-273).

    r = min(1, init_ratio + 2·exp_iter_ratio); each range interpolates from
    its default-view center to the full range. Returns (theta, phi, radius)
    pairs as traced scalars when progressive_view is on, else the static
    full ranges. The reference mutates opt.*_range in place each cal_loss —
    here the same schedule is a pure function of the step.
    """
    if not gcfg.progressive_view:
        return gcfg.theta_range, gcfg.phi_range, gcfg.radius_range
    end = gcfg.exp_end_iter or n_iters
    ratio = (jnp.asarray(step_i, jnp.float32) - gcfg.exp_start_iter) / max(
        end - gcfg.exp_start_iter, 1)
    r = jnp.minimum(1.0, gcfg.progressive_view_init_ratio + 2.0 * ratio)

    def lerp(default, full):
        return (default * (1.0 - r) + full[0] * r,
                default * (1.0 - r) + full[1] * r)

    return (lerp(gcfg.default_polar, gcfg.theta_range),
            lerp(gcfg.default_azimuth, gcfg.phi_range),
            lerp(gcfg.default_radius, gcfg.radius_range))


@dataclass
class ProgressiveViews:
    """Progressively widen pose sampling ranges (nerf/utils.py:264-273)."""

    full_theta: Tuple[float, float] = (0.0, 120.0)
    full_phi: Tuple[float, float] = (0.0, 360.0)
    full_radius: Tuple[float, float] = (1.0, 1.5)
    init_frac: float = 0.2
    expand_iters: int = 5000

    def ranges(self, step: int):
        f = min(self.init_frac + (1.0 - self.init_frac)
                * step / self.expand_iters, 1.0)

        def widen(lo_hi):
            lo, hi = lo_hi
            mid = 0.5 * (lo + hi)
            half = 0.5 * (hi - lo) * f
            return (mid - half, mid + half)

        return widen(self.full_theta), widen(self.full_phi), self.full_radius
