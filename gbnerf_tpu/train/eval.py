"""Eval rendering: pose-path renders, video/PNG artifact dumps.

Parity with render_path (/root/reference/run.py:1751-1891): render every pose
at optional reduced resolution, dump per-frame rgb/disp PNGs and rgb/disp
mp4s. Host loop over poses; each frame is one jitted blocked render.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..utils.metrics import to8b
from .step import make_image_renderer, _full_view_rays


def render_pose_path(render_fn, params, poses, hwf, *, render_factor: int = 0,
                     block: int = 8192):
    """Render [N, 3, 4]+ poses → dict of stacked numpy maps.

    render_factor > 1 downsamples H/W/focal (reference --render_factor).
    """
    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    if render_factor and render_factor > 1:
        H, W, focal = H // render_factor, W // render_factor, focal / render_factor

    image_render = make_image_renderer(render_fn, block=block)
    rgbs, disps, depths, accs = [], [], [], []
    for pose in poses:
        ro, rd = _full_view_rays(H, W, focal, jnp.asarray(pose[:3, :4]))
        out = image_render(params, ro, rd)
        rgbs.append(np.asarray(out["rgb"]))
        disps.append(np.asarray(out["disp"]))
        depths.append(np.asarray(out["depth"]))
        accs.append(np.asarray(out["acc"]))
    return {"rgb": np.stack(rgbs), "disp": np.stack(disps),
            "depth": np.stack(depths), "acc": np.stack(accs)}


def convert_pose(c2w: np.ndarray) -> np.ndarray:
    """OpenGL → OpenCV camera flip (reference convert_pose, run.py:1964)."""
    flip_yz = np.eye(4)
    flip_yz[1, 1] = flip_yz[2, 2] = -1.0
    return c2w @ flip_yz


def render_path_projection(render_fn, params, poses, hwf, *,
                           render_factor: int = 0, block: int = 8192):
    """Per-pose z_vals/weights + converted poses + intrinsics — the
    reprojection/warping inputs (reference render_path_projection,
    run.py:1933-1961)."""
    import jax.numpy as jnp

    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    if render_factor and render_factor > 1:
        H, W, focal = H // render_factor, W // render_factor, focal / render_factor
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])

    @__import__("jax").jit
    def one(params, pose):
        ro, rd = _full_view_rays(H, W, focal, pose)
        out = render_fn(params, ro.reshape(-1, 3), rd.reshape(-1, 3), None,
                        train=False)
        return out.z_vals, out.weights

    z_vals, weights, c2ws = [], [], []
    for pose in poses:
        z, w = one(params, jnp.asarray(pose[:3, :4]))
        z_vals.append(np.asarray(z))
        weights.append(np.asarray(w))
        p44 = np.concatenate([np.asarray(pose[:3, :4]),
                              np.array([[0, 0, 0, 1.0]])], axis=0)
        c2ws.append(convert_pose(p44))
    return z_vals, weights, c2ws, K


def render_test_ray(make_field_fn, params, ray_o, ray_d, *, near: float,
                    far: float, n_samples: int, ndc=None):
    """σ/weight profile along a single ray at ``n_samples`` UNIFORM
    z-values (reference render_test_ray, run.py:1972-2000: linspace
    near→far — NOT the render pipeline's hierarchical samples — with the
    FINE network queried directly at those points and σ = relu(raw σ);
    visualize_sigma plots σ vs z, run_nerf_helpers.py:481-486).

    Args:
      make_field_fn: ``params → FieldFn`` factory (the field params thread
        as jit ARGUMENTS, never closure constants — design invariant).
      ndc: optional (H, W, focal) — the reference maps the ray through
        ndc_rays and marches the [0, 1] NDC range for forward-facing
        scenes (run.py:1981-1983).
    """
    import jax
    import jax.numpy as jnp

    from ..core.render import raw2outputs

    @jax.jit
    def march(params, ray_o, ray_d):
        viewdirs = (ray_d / jnp.linalg.norm(ray_d))[None]     # [1, 3]
        ro, rd = ray_o[None], ray_d[None]
        lo, hi = near, far
        if ndc is not None:
            from ..core.rays import ndc_rays

            H, W, focal = ndc
            ro, rd = ndc_rays(int(H), int(W), float(focal), 1.0, ro, rd)
            lo, hi = 0.0, 1.0
        t = jnp.linspace(0.0, 1.0, n_samples, dtype=ro.dtype)
        z_vals = (lo * (1.0 - t) + hi * t)[None]              # [1, S]
        pts = ro[:, None, :] + rd[:, None, :] * z_vals[..., None]
        raw = make_field_fn(params)(pts, viewdirs)
        rgb, _, _, weights, depth, alpha = raw2outputs(raw, z_vals, rd)
        return (z_vals, jax.nn.relu(raw[..., 3]), weights, alpha, depth,
                rgb)

    z_vals, sigma, weights, alpha, depth, rgb = march(params, ray_o, ray_d)
    return {
        "z_vals": np.asarray(z_vals[0]),
        "sigma": np.asarray(sigma[0]),
        "weights": np.asarray(weights[0]),
        "alpha": np.asarray(alpha[0]),
        "depth": float(depth[0]),
        "rgb": np.asarray(rgb[0]),
    }


def visualize_sigma(profile: dict, path: str) -> None:
    """Plot the per-sample σ profile of one ray to a PNG (reference
    visualize_sigma, run_nerf_helpers.py:481-486: σ vs z_vals)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 3))
    ax.plot(profile["z_vals"], profile["sigma"])
    ax.axvline(profile["depth"], color="r", ls="--", label="depth")
    ax.set_xlabel("z_vals")
    ax.set_ylabel("sigma")
    ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)


def save_video(frames: np.ndarray, path: str, fps: int = 30) -> str:
    """Write an mp4 (reference rgb.mp4/disp.mp4 artifacts); falls back to GIF
    when no ffmpeg backend is available in the environment."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        imageio.mimwrite(path, to8b(frames), fps=fps, quality=8)
        return path
    except (ValueError, ImportError):
        gif = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif, to8b(frames), duration=1000.0 / fps, loop=0)
        return gif


def _psnr(mse: float) -> float:
    return -10.0 * np.log10(max(mse, 1e-10))


def dump_eval_images(maps: dict, outdir: str, *, gt: Optional[np.ndarray] = None,
                     lpips_fn=None, gt_masks: Optional[np.ndarray] = None):
    """Per-frame rgb/disp PNG dumps (reference eval_images_{i}/ layout).

    Returns a metrics dict {psnr, lpips, psnr_masked, psnr_unmasked} of
    means over ground-truth views; entries are None when not computable.
    lpips_fn: optional utils.lpips.LPIPS instance — the paper's quality
    metrics are PSNR + LPIPS (SURVEY.md §6). gt_masks: optional [N, H, W]
    inpaint-region test masks (1 = inpainted) — psnr_masked restricts the
    error to the inpainted region, the quantity the guidance stage exists
    to improve (reference README.md:7).
    """
    import imageio.v2 as imageio

    os.makedirs(os.path.join(outdir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(outdir, "disp"), exist_ok=True)
    psnrs, lpipss, m_psnrs, u_psnrs = [], [], [], []
    for k in range(len(maps["rgb"])):
        imageio.imwrite(os.path.join(outdir, "rgb", f"{k:03d}.png"),
                        to8b(maps["rgb"][k]))
        disp = maps["disp"][k]
        imageio.imwrite(os.path.join(outdir, "disp", f"{k:03d}.png"),
                        to8b(disp / max(disp.max(), 1e-8)))
        if gt is not None:
            err = (maps["rgb"][k] - gt[k]) ** 2
            psnrs.append(_psnr(float(np.mean(err))))
            if gt_masks is not None and gt_masks[k].max() > 0:
                m = gt_masks[k][..., None] > 0.5
                m_psnrs.append(_psnr(float(np.mean(err[np.broadcast_to(
                    m, err.shape)]))))
                u_psnrs.append(_psnr(float(np.mean(err[np.broadcast_to(
                    ~m, err.shape)]))))
            if lpips_fn is not None:
                import jax.numpy as jnp

                lpipss.append(float(np.mean(np.asarray(lpips_fn(
                    jnp.asarray(maps["rgb"][k])[None],
                    jnp.asarray(gt[k])[None])))))
    mean = lambda xs: float(np.mean(xs)) if xs else None
    return {"psnr": mean(psnrs), "lpips": mean(lpipss),
            "psnr_masked": mean(m_psnrs), "psnr_unmasked": mean(u_psnrs)}
