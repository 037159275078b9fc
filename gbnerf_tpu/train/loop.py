"""Training driver: the run.py train() equivalent.

Orchestrates: scene load → ray banks → state init/restore → jitted step loop
(stage 1 or stage 2) → periodic checkpoint / video / eval dumps
(/root/reference/run.py:687-1622). All hot work happens inside the jitted
steps; this loop only feeds rng keys and handles cadenced IO.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config, save_config
from ..data.llff import load_colmap_depth, load_llff_data
from ..data.rays_bank import build_ray_banks
from .checkpoint import CheckpointManager
from .eval import dump_eval_images, render_pose_path, save_video
from .state import create_train_state
from .step import (make_render_fn, make_train_step_stage1,
                   make_train_step_stage2)


def render_only(cfg: Config) -> dict:
    """Reference --render_only short-circuit (run.py:976-1023): reload the
    latest checkpoint and render the test + spiral paths to disk."""
    t = cfg.train
    expdir = os.path.join(t.basedir, t.expname)
    scene = load_llff_data(
        cfg.data.datadir, cfg.data.factor, spherify=cfg.data.spherify,
        origin=cfg.data.origin, test_split_count=cfg.data.test_split_count)

    rng = jax.random.PRNGKey(t.seed)
    state, coarse, fine = create_train_state(cfg, rng)
    ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
    step = ckpt.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint found under {expdir}/ckpt")
    state = ckpt.restore(state)
    ckpt.close()

    render_fn = make_render_fn(cfg, coarse, fine, scene.near, scene.far)
    outdir = os.path.join(expdir, f"renderonly_{step:06d}")
    rf = max(t.render_factor, 1)
    if len(scene.poses_test):
        maps = render_pose_path(render_fn, state.params, scene.poses_test,
                                scene.hwf, render_factor=rf)
        dump_eval_images(maps, os.path.join(outdir, "test"))
    maps = render_pose_path(render_fn, state.params, scene.render_poses,
                            scene.hwf, render_factor=rf)
    save_video(maps["rgb"], os.path.join(outdir, "spiral_rgb.mp4"))
    print(f"render_only: wrote {outdir}")
    return {"outdir": outdir, "step": step}


def banks_to_device(banks):
    out = {
        "rgb": banks.rgb.device_put(),
        "rgb_clf": banks.rgb_clf.device_put(),
        "rgb_sds": banks.rgb_sds.device_put(),
        "inp": banks.inp.device_put(),
        "depth": banks.depth.device_put() if banks.depth is not None else None,
    }
    return out


def scene_to_device(scene, banks):
    return {
        "images": jnp.asarray(scene.images),
        "masks": jnp.asarray(scene.masks),
        "poses": jnp.asarray(scene.poses),
        "mask_coords": jnp.asarray(banks.mask_coords),
        "mask_valid": jnp.asarray(banks.mask_valid),
    }


def train(cfg: Config, *, guidance_fn=None,
          log_fn: Callable[[int, dict], None] = None,
          scene=None, depth_gts=None) -> dict:
    """Run the full training loop; returns final state + summary.

    scene/depth_gts can be injected (tests, synthetic data); otherwise loaded
    from cfg.data.datadir.
    """
    t = cfg.train
    expdir = os.path.join(t.basedir, t.expname)
    os.makedirs(expdir, exist_ok=True)
    save_config(cfg, os.path.join(expdir, "config.txt"))

    if scene is None:
        scene = load_llff_data(
            cfg.data.datadir, cfg.data.factor, spherify=cfg.data.spherify,
            origin=cfg.data.origin,
            test_split_count=cfg.data.test_split_count)
        if cfg.data.colmap_depth and depth_gts is None:
            depth_gts = load_colmap_depth(
                cfg.data.datadir, cfg.data.factor,
                skip_first=cfg.data.test_split_count)

    H, W, focal = scene.hwf
    banks = build_ray_banks(scene.images, scene.masks, scene.inpainted_depths,
                            scene.poses, focal, depth_gts)
    banks_dev = banks_to_device(banks)
    scene_dev = scene_to_device(scene, banks)

    rng = jax.random.PRNGKey(t.seed)
    rng, k_init = jax.random.split(rng)
    state, coarse, fine = create_train_state(cfg, k_init)

    ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
    if not t.no_reload:
        state = ckpt.restore(state)
    start = int(state.step)

    # Build the diffusion-prior guidance when stage 2 asks for it
    # (reference run.py:1204-1221). guidance_fn may also be injected.
    g = cfg.guidance
    if (guidance_fn is None and not t.first_stage
            and "SD" in g.guidance
            and (g.is_rgb_guidance or g.is_normal_guidance)
            and (g.sd_weights_dir or g.sd_tiny)):
        from ..guidance import build_sd_modules, make_guidance_fn
        from ..guidance.text import CLIPTextConfig
        from ..guidance.unet import UNetConfig
        from ..guidance.vae import VAEConfig

        rng, k_sd = jax.random.split(rng)
        kw = {}
        if g.sd_tiny:
            kw = dict(unet_config=UNetConfig.tiny(),
                      vae_config=VAEConfig.tiny(),
                      text_config=CLIPTextConfig(
                          vocab_size=49408, width=32, layers=2, heads=2),
                      latent_size=64, dtype=jnp.float32)
        mods = build_sd_modules(g, k_sd, weights_dir=g.sd_weights_dir, **kw)
        guidance_fn = make_guidance_fn(mods, g)
        print(f"[guidance] SD stack ready "
              f"({'tiny' if g.sd_tiny else 'SD1.5-inpaint'}, "
              f"weights={'loaded' if g.sd_weights_dir else 'random'})")

    render_fn = make_render_fn(cfg, coarse, fine, scene.near, scene.far)
    if t.first_stage:
        step_fn = make_train_step_stage1(cfg, coarse, fine, scene.near, scene.far)
        def do_step(state, key):
            return step_fn(state, banks_dev, key)
    else:
        step_fn = make_train_step_stage2(
            cfg, coarse, fine, scene.near, scene.far, scene.hwf,
            guidance_fn=guidance_fn)
        def do_step(state, key):
            return step_fn(state, scene_dev, banks_dev, key)

    t0 = time.time()
    history = []
    for i in range(start, t.N_iters):
        rng, key = jax.random.split(rng)
        state, metrics = do_step(state, key)

        if (i + 1) % t.i_print == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["iters_per_sec"] = t.i_print / max(time.time() - t0, 1e-9)
            t0 = time.time()
            history.append((i + 1, m))
            if log_fn:
                log_fn(i + 1, m)
            else:
                print(f"[{i + 1}/{t.N_iters}] " +
                      " ".join(f"{k}={v:.4g}" for k, v in m.items()))
        if (i + 1) % t.i_weights == 0:
            ckpt.save(i + 1, jax.device_get(state))
        if (i + 1) % t.i_video == 0 and len(scene.render_poses):
            maps = render_pose_path(render_fn, state.params,
                                    scene.render_poses, scene.hwf,
                                    render_factor=max(t.render_factor, 1))
            save_video(maps["rgb"], os.path.join(
                expdir, f"spiral_{i + 1:06d}_rgb.mp4"))
            d = maps["disp"] / max(maps["disp"].max(), 1e-8)
            save_video(d, os.path.join(expdir, f"spiral_{i + 1:06d}_disp.mp4"))
        if (i + 1) % t.i_evaluate == 0 and len(scene.poses_test):
            maps = render_pose_path(render_fn, state.params, scene.poses_test,
                                    scene.hwf,
                                    render_factor=max(t.render_factor, 1))
            dump_eval_images(maps, os.path.join(expdir, f"eval_images_{i + 1}"))

    ckpt.save(int(state.step), jax.device_get(state))
    ckpt.close()
    return {"state": state, "render_fn": render_fn, "scene": scene,
            "history": history}
