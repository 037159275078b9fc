"""Training driver: the run.py train() equivalent.

Orchestrates: scene load → ray banks → state init/restore → jitted step loop
(stage 1 or stage 2) → periodic checkpoint / video / eval dumps
(/root/reference/run.py:687-1622). All hot work happens inside the jitted
steps; this loop only feeds rng keys and handles cadenced IO.
"""
from __future__ import annotations

import json
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


def load_scene(cfg: Config):
    """Dataset dispatch (reference --dataset_type, run.py:847-916).

    Divergence, documented: the reference's dataset_type=custom calls an
    undefined load_custom_data (run.py:718, SURVEY.md §2.2) — here unknown
    types raise a clear error."""
    d = cfg.data
    if d.dataset_type == "llff":
        return load_llff_data(d.datadir, d.factor, spherify=d.spherify,
                              origin=d.origin,
                              test_split_count=d.test_split_count,
                              llffhold=d.llffhold)
    if d.dataset_type == "nerd":
        from ..data.llff import load_nerd_data

        return load_nerd_data(d.datadir, d.factor, spherify=d.spherify)
    if d.dataset_type == "blender":
        import numpy as np

        from ..data.blender import load_blender_data
        from ..data.llff import LLFFScene

        imgs, poses, render_poses, hwf, i_split, masks, objects = \
            load_blender_data(d.datadir, half_res=d.half_res,
                              testskip=d.testskip)
        # RGBA → RGB on the configured background
        if imgs.shape[-1] == 4:
            bg = 1.0 if cfg.render.white_bkgd else 0.0
            imgs = imgs[..., :3] * imgs[..., 3:] + bg * (1.0 - imgs[..., 3:])
        i_train, _, i_test = i_split
        H, W = imgs.shape[1:3]
        n_tr = len(i_train)
        tr_masks = (masks[..., 0] if masks.ndim == 4 else masks) \
            if len(masks) == n_tr else np.zeros((n_tr, H, W), np.float32)
        hwf34 = np.broadcast_to(
            np.array([[hwf[0]], [hwf[1]], [hwf[2]]], np.float32), (3, 1))
        p35 = np.concatenate(
            [poses[:, :3, :4], np.tile(hwf34[None], (len(poses), 1, 1))], 2)
        return LLFFScene(
            images=imgs[i_train].astype(np.float32),
            masks=tr_masks.astype(np.float32),
            inpainted_depths=np.zeros((n_tr, H, W), np.float32),
            poses=p35[i_train], poses_test=p35[i_test],
            bds=np.array([[2.0, 6.0]], np.float32),
            render_poses=np.concatenate(
                [render_poses[:, :3, :4],
                 np.tile(hwf34[None], (len(render_poses), 1, 1))], 2),
            hwf=(H, W, float(hwf[2])), near=2.0, far=6.0)
    if d.dataset_type == "dtu":
        import numpy as np

        from ..data.blender import load_dtu_data
        from ..data.llff import LLFFScene

        imgs, poses, hwf = load_dtu_data(d.datadir)
        H, W, focal = hwf
        n = len(imgs)
        hwf34 = np.array([[H], [W], [focal]], np.float32)
        p35 = np.concatenate(
            [poses, np.tile(hwf34[None], (n, 1, 1))], 2).astype(np.float32)
        return LLFFScene(
            images=imgs.astype(np.float32),
            masks=np.zeros((n, H, W), np.float32),
            inpainted_depths=np.zeros((n, H, W), np.float32),
            poses=p35, poses_test=p35[:1],
            bds=np.array([[0.5, 3.5]], np.float32),
            render_poses=p35[:8], hwf=(H, W, float(focal)),
            near=0.5, far=3.5)
    raise SystemExit(f"unknown dataset_type: {d.dataset_type!r} "
                     "(llff | nerd | blender | dtu)")


def load_alpha_model(cfg: Config):
    """NeRF_RGB parity (reference --alpha_model_path, run.py:2015-2044):
    load a pretrained run's fine field to supply frozen σ; returns
    (model, params) or None. Points at a checkpoint dir of THIS framework
    (the reference points at a .tar of its own format)."""
    path = cfg.field.alpha_model_path
    if not path:
        return None
    dummy, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(path)
    if mgr.latest_step() is None:
        raise SystemExit(f"alpha_model_path has no checkpoint: {path}")
    restored = mgr.restore(dummy)
    mgr.close()
    which = "fine" if fine is not None else "coarse"
    print(f"[alpha] frozen σ from {path} ({which} field)")
    return (fine if fine is not None else coarse, restored.params[which])


def render_only(cfg: Config) -> dict:
    """Reference --render_only short-circuit (run.py:976-1023): reload the
    latest checkpoint and render the test + spiral paths to disk."""
    t = cfg.train
    expdir = os.path.join(t.basedir, t.expname)
    scene = load_scene(cfg)

    rng = jax.random.PRNGKey(t.seed)
    state, coarse, fine = create_train_state(cfg, rng)
    ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
    step = ckpt.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint found under {expdir}/ckpt")
    state = ckpt.restore(state)
    ckpt.close()

    alpha = load_alpha_model(cfg)
    render_fn = make_render_fn(cfg, coarse, fine, scene.near, scene.far,
                               alpha=alpha, hwf=scene.hwf)
    # Frozen alpha params ride under params["alpha"] as jit ARGUMENTS
    # (design invariant: never closure-bake params into executables).
    eparams = (dict(state.params, alpha=alpha[1]) if alpha is not None
               else state.params)
    outdir = os.path.join(expdir, f"renderonly_{step:06d}")
    rf = max(t.render_factor, 1)
    rblock = cfg.render.render_block
    if len(scene.poses_test):
        maps = render_pose_path(render_fn, eparams, scene.poses_test,
                                scene.hwf, render_factor=rf, block=rblock)
        dump_eval_images(maps, os.path.join(outdir, "test"))
    if t.render_test_ray:
        # σ/weight profile of the central ray of the first available pose
        # (reference --render_test_ray debugging path, run.py:997-1010 →
        # render_test_ray + visualize_sigma).
        from ..core.fields import make_field_fn, make_frozen_sigma_field_fn
        from ..core.rays import get_rays
        from .eval import render_test_ray, visualize_sigma

        pose = (scene.poses_test if len(scene.poses_test) else scene.poses)[0]
        H, W, focal = scene.hwf
        ro, rd = get_rays(int(H), int(W), focal, jnp.asarray(pose[:3, :4]))

        # the reference marches the FINE network (run.py:1004
        # network=render_kwargs_test['network_fine']) at render-kwargs
        # N_samples, through ndc_rays when forward-facing
        def field_factory(params):
            fn = make_field_fn(fine if fine is not None else coarse,
                               params["fine" if fine is not None
                                      else "coarse"])
            if alpha is not None:
                fn = make_frozen_sigma_field_fn(
                    fn, make_field_fn(alpha[0], params["alpha"]))
            return fn

        prof = render_test_ray(
            field_factory, eparams,
            ro[int(H) // 2, int(W) // 2], rd[int(H) // 2, int(W) // 2],
            near=scene.near, far=scene.far,
            n_samples=cfg.render.N_samples,
            ndc=None if cfg.render.no_ndc else scene.hwf)
        os.makedirs(outdir, exist_ok=True)
        np.savez(os.path.join(outdir, "test_ray.npz"), **prof)
        visualize_sigma(prof, os.path.join(outdir, "sigma.png"))
    # --render_test renders the held-out poses instead of the spiral path
    # (reference run.py:979-986); --render_train the TRAIN poses
    # (run.py:928,989).
    path_poses = (scene.poses if t.render_train else
                  scene.poses_test if t.render_test and len(scene.poses_test)
                  else scene.render_poses)
    maps = render_pose_path(render_fn, eparams, path_poses,
                            scene.hwf, render_factor=rf, block=rblock)
    # Raw-array dumps alongside the PNGs (reference render_path saves
    # per-frame depth/disp/weights npy files, run.py:1847-1869; stacked
    # [N, H, W] arrays here — same data, one file per map).
    for k in ("depth", "disp", "acc"):
        if k in maps:
            np.save(os.path.join(outdir, f"{k}.npy"), np.asarray(maps[k]))
    save_video(maps["rgb"], os.path.join(outdir, "spiral_rgb.mp4"))
    print(f"render_only: wrote {outdir}")
    return {"outdir": outdir, "step": step}


def banks_to_device(banks):
    # Divergence, documented: the reference builds DataLoader iterators over
    # its `rays_rgb` (masked) and `rays_rgb_sds` (all) banks and DRAWS from
    # them every iteration without ever using the draw (run.py:1261-1265,
    # 1340-1345 — the batches feed nothing in the shipped stage-2 loss).
    # We keep those banks host-side (rays_bank.py builds them; the masked
    # stream is covered by the per-view mask_coords table) and upload only
    # the streams the steps actually sample — at SPIn-NeRF scale the two
    # dead banks are ~2×100 MB of HBM.
    out = {
        "rgb_clf": banks.rgb_clf.device_put(),
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
        scene = load_scene(cfg)
        if (cfg.data.colmap_depth and depth_gts is None
                and cfg.data.dataset_type == "llff"):
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
    if t.ft_path:
        # Warm-start from a specific checkpoint (reference --ft_path takes
        # precedence over the latest-ckpt scan, run.py:2075-2076). Accepts
        # another run's ckpt dir, or .../ckpt/<step> to pin a step.
        src = os.path.normpath(t.ft_path)
        step_sel = None
        if os.path.basename(src).isdigit():
            step_sel, src = int(os.path.basename(src)), os.path.dirname(src)
        ft = CheckpointManager(src)
        state = ft.restore(state, step=step_sel)
        ft.close()
        print(f"[ckpt] warm-start from {t.ft_path} "
              f"(step {int(state.step)})")
    elif not t.no_reload:
        state = ckpt.restore(state)
        if int(state.step):
            print(f"[ckpt] resumed at iter {int(state.step)}"
                  + (" — nothing to do" if int(state.step) >= t.N_iters
                     else f" (→ {t.N_iters})"))
    # De-commit restored arrays to host: orbax restores them pinned to one
    # device, which conflicts with the mesh sharding constraints inside the
    # SPMD step on multi-device hosts; uncommitted arrays let the step's
    # shardings place them.
    state = jax.tree_util.tree_map(np.asarray, state)
    start = int(state.step)

    # Build the diffusion-prior guidance when stage 2 asks for it
    # (reference run.py:1204-1221). guidance_fn may also be injected.
    g = cfg.guidance
    gparams = None
    if (guidance_fn is None and not t.first_stage
            and "SD" in g.guidance
            and (g.is_rgb_guidance or g.is_normal_guidance)
            and (g.sd_weights_dir or g.sd_tiny or g.sd_allow_random)):
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
                      latent_size=g.sd_latent_size or 64, dtype=jnp.float32)
        elif g.sd_latent_size:
            kw = dict(latent_size=g.sd_latent_size)
        mods = build_sd_modules(g, k_sd, weights_dir=g.sd_weights_dir, **kw)
        if g.sd_prior_ckpt:
            from ..guidance.weights import load_prior_ckpt

            mods = load_prior_ckpt(g.sd_prior_ckpt, mods)
            if g.sd_lora_ckpt:
                # The reference's end-to-end workflow on the tiny stack:
                # LoRA adapters fine-tuned ON the prior (train_lora.py
                # --sd_prior_ckpt) merge after the prior load. Text
                # adapters cannot apply here — the prior ckpt bakes the
                # prompt embeds, there is no text tower to adapt.
                import dataclasses as _dc

                from ..guidance.lora import (merge_lora_strict,
                                             split_adapters)

                unet_ad, text_ad = split_adapters(g.sd_lora_ckpt)
                if text_ad is not None:
                    raise ValueError(
                        "sd_lora_ckpt contains text-encoder adapters but "
                        "sd_prior_ckpt bakes the prompt embeds — retrain "
                        "the LoRA without --train_text_encoder for the "
                        "prior-ckpt flow.")
                mods = _dc.replace(mods, unet_params=merge_lora_strict(
                    mods.unet_params, unet_ad, what="prior unet",
                    source=g.sd_lora_ckpt))
                print(f"[guidance] merged flax LoRA adapters from "
                      f"{g.sd_lora_ckpt} into the prior unet")
        guidance_fn = make_guidance_fn(mods, g, n_iters=t.N_iters)
        from ..guidance.stable import guidance_params

        gparams = guidance_params(mods)
        if g.is_rgb_guidance and g.cache_masked_latents:
            # Per-view constant: the RGB composite's masked conditioning
            # image. One full-size VAE encode per step saved (59.9 → 52.0
            # ms measured); divergence documented at the helper.
            from ..guidance.stable import precompute_masked_latents

            rng, k_ml = jax.random.split(rng)
            scene_dev["masked_latents"] = precompute_masked_latents(
                mods, scene_dev["images"], scene_dev["masks"], rng=k_ml)
            print(f"[guidance] cached {scene_dev['images'].shape[0]} "
                  "per-view masked-conditioning latents")
        wsrc = ("prior-ckpt" if g.sd_prior_ckpt
                else "loaded" if g.sd_weights_dir else "random")
        print(f"[guidance] SD stack ready "
              f"({'tiny' if g.sd_tiny else 'SD1.5-inpaint'}, "
              f"weights={wsrc})")
    elif (guidance_fn is None and not t.first_stage
          and "SD" in g.guidance
          and (g.is_rgb_guidance or g.is_normal_guidance)):
        print("[guidance] WARNING: guidance requested but no sd_weights_dir "
              "given — guidance DISABLED. Set sd_weights_dir to a local "
              "diffusers checkpoint (or sd_tiny/sd_allow_random for "
              "weightless runs).")

    lpips_fn = None
    if t.lpips or t.lpips_weights:
        from ..utils.lpips import LPIPS, load_vgg16_npz

        rng, k_lp = jax.random.split(rng)
        weights = load_vgg16_npz(t.lpips_weights) if t.lpips_weights else None
        lpips_fn = LPIPS(k_lp, weights=weights)
        if weights is None:
            print("[lpips] WARNING: no lpips_weights given — VGG features "
                  "are RANDOM. Usable as a patch-loss regularizer, but "
                  "reported LPIPS values are NOT comparable to paper "
                  "numbers.")

    alpha = load_alpha_model(cfg)
    # Frozen alpha params ride as jit ARGUMENTS (design invariant: never
    # closure-bake params into executables); eval merges them under
    # params["alpha"].
    aparams = jax.device_put(alpha[1]) if alpha is not None else None
    def eval_params(p):
        return dict(p, alpha=aparams) if alpha is not None else p
    render_fn = make_render_fn(cfg, coarse, fine, scene.near, scene.far,
                               alpha=alpha, hwf=scene.hwf)
    # Multi-chip: shard the per-iteration ray work over a 1D data mesh
    # (params replicated; XLA all-reduces grads over ICI). The same jitted
    # step runs 1-chip (mesh=None) or N-chip. With guidance.tp > 1 the mesh
    # gains a `model` axis and the SD towers shard over it (parallel/tp.py)
    # — rays stay on `data`, GSPMD places the guidance collectives.
    mesh = None
    data_axis = cfg.mesh.data_axis
    n_dev = jax.device_count()
    if cfg.mesh.num_devices:            # 0 → all local devices
        n_dev = min(n_dev, int(cfg.mesh.num_devices))
    if n_dev > 1:
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices()[:n_dev])
        tp = int(g.tp) if (gparams is not None and g.tp) else 0
        if tp > 1:
            if len(devs) % tp:
                raise SystemExit(
                    f"guidance_tp={tp} does not divide device count "
                    f"{len(devs)}")
            mesh = Mesh(devs.reshape(-1, tp), (data_axis, "model"))
            from ..parallel.tp import shard_params_tp

            gparams = shard_params_tp(gparams, mesh)
            print(f"[mesh] {data_axis}×model = {mesh.shape[data_axis]}×{tp}: "
                  "guidance towers tensor-parallel over `model`")
        else:
            mesh = Mesh(devs, (data_axis,))
            print(f"[mesh] data-parallel over {n_dev} devices")
    elif g.tp and int(g.tp) > 1:
        print(f"[mesh] WARNING: guidance_tp={g.tp} requested but only one "
              "device is visible — running unsharded")
    # step_extras ride as explicit arguments everywhere (design invariant:
    # never closure-bake device arrays into a jitted program — the chunked
    # dispatch below jits OVER raw_step, and captured banks would become
    # baked-in constants).
    if t.first_stage:
        step_fn = make_train_step_stage1(cfg, coarse, fine, scene.near,
                                         scene.far, alpha=alpha, mesh=mesh,
                                         mesh_axis=data_axis,
                                         hwf=scene.hwf)
        step_extras = (banks_dev, aparams)

        def raw_step(state, key, banks, ap):
            return step_fn(state, banks, key, ap)
    else:
        step_fn = make_train_step_stage2(
            cfg, coarse, fine, scene.near, scene.far, scene.hwf,
            guidance_fn=guidance_fn, lpips_fn=lpips_fn, alpha=alpha,
            mesh=mesh, mesh_axis=data_axis)
        step_extras = (scene_dev, banks_dev, gparams, aparams)

        def raw_step(state, key, scene_d, banks, gp, ap):
            return step_fn(state, scene_d, banks, key, gp, ap)

    def do_step(state, key):
        return raw_step(state, key, *step_extras)

    # Optional EMA of params (capability parity with the reference's dead
    # stable-dreamfusion trainer, SURVEY.md §2.2 pgc.py).
    ema_params = None
    ema_update = None
    if t.ema_decay > 0.0:
        ema_params = state.params
        ema_update = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda a, b: t.ema_decay * a + (1.0 - t.ema_decay) * b, e, p))

    # Multi-step dispatch: K train steps as ONE lax.scan program
    # (train.steps_per_dispatch). The last chunk shrinks to the next
    # host-cadence boundary so prints/ckpts/evals land on the same
    # iterations as the K=1 path.
    k_disp = max(1, int(t.steps_per_dispatch))
    if k_disp > 1:
        import functools

        @functools.partial(jax.jit, static_argnames="n")
        def do_chunk(st, ema, rng, n, *extras):
            def body(carry, key):
                s, e = carry
                s, metrics = raw_step(s, key, *extras)
                if ema_update is not None:
                    e = jax.tree_util.tree_map(
                        lambda a, b: (t.ema_decay * a
                                      + (1.0 - t.ema_decay) * b),
                        e, s.params)
                return (s, e), metrics
            keys = jax.random.split(rng, n)
            (st, ema), ms = jax.lax.scan(body, (st, ema), keys)
            return st, ema, jax.tree_util.tree_map(lambda x: x[-1], ms)

    cadences = [c for c in (t.i_print, t.i_weights, t.i_video,
                            t.i_evaluate, t.i_testset) if c and c > 0]
    rblock = cfg.render.render_block

    # Preemption-graceful shutdown (beyond reference, whose only recovery
    # is restart + ckpt reload): SIGTERM/SIGINT set a flag; the loop breaks
    # at the next host iteration and the tail ckpt.save persists progress,
    # so auto-resume loses at most one dispatch chunk instead of up to
    # i_weights iterations.
    import signal as _signal

    _stop = {"sig": None}
    _old = {}
    for _s in (_signal.SIGTERM, _signal.SIGINT):
        try:
            _old[_s] = _signal.signal(
                _s, lambda signum, frame: _stop.update(sig=signum))
        except ValueError:          # not the main thread: skip
            pass

    try:
        t0 = time.time()
        history = []
        last_eval = None
        nan_restores = 0
        preempted = False
        it = start
        while it < t.N_iters:
            if _stop["sig"] is not None:
                preempted = True
                print(f"[preempt] signal {_stop['sig']} at iter {it}: saving "
                      "checkpoint and exiting (auto-resume will continue)")
                break
            rng, key = jax.random.split(rng)
            if k_disp == 1:
                it += 1
                state, metrics = do_step(state, key)
            else:
                k = min([k_disp, t.N_iters - it]
                        + [c - (it % c) for c in cadences])
                it += k
                state, ema_params, metrics = do_chunk(
                    state, ema_params, key, k, *step_extras)
            i = it - 1          # cadence checks below use (i + 1) == it

            # Failure recovery (beyond reference, SURVEY.md §5): a non-finite
            # loss would poison params for every later step — restore the
            # latest checkpoint and re-fork the rng stream instead. Checked on
            # the i_print cadence only (a float() fetch per step would stall
            # the async dispatch pipeline through the tunnel).
            if (t.nan_restarts and (i + 1) % t.i_print == 0
                    and not np.isfinite(float(metrics["loss"]))):
                nan_restores += 1
                if nan_restores > t.nan_restarts:
                    raise SystemExit(
                        f"loss non-finite after {t.nan_restarts} checkpoint "
                        f"restores — aborting at iter {i + 1}")
                prev = ckpt.latest_step()
                print(f"[recover] non-finite loss at iter {i + 1}; restoring "
                      f"ckpt {prev if prev is not None else '(init)'} "
                      f"({nan_restores}/{t.nan_restarts})")
                if prev is not None:
                    # de-commit to host (see restore note above)
                    state = jax.tree_util.tree_map(np.asarray,
                                                   ckpt.restore(state))
                else:
                    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(
                        t.seed + nan_restores))
                # EMA may have blended non-finite params for up to i_print-1
                # steps before detection — reset it to the restored params.
                if ema_params is not None:
                    ema_params = state.params
                rng = jax.random.fold_in(rng, 1000 + nan_restores)
                continue
            if ema_update is not None and k_disp == 1:
                # (k_disp > 1 applies the EMA inside the scanned chunk)
                ema_params = ema_update(ema_params, state.params)

            if (i + 1) % t.i_print == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["iters_per_sec"] = t.i_print / max(time.time() - t0, 1e-9)
                t0 = time.time()
                history.append((i + 1, m))
                # Observability beyond the reference's print-only loop
                # (SURVEY.md §5): machine-readable metrics stream per run.
                # Non-finite floats become null — bare NaN/Infinity tokens are
                # invalid strict JSON, exactly in the runs this stream is
                # meant to diagnose.
                safe = {k: (v if np.isfinite(v) else None) for k, v in m.items()}
                with open(os.path.join(expdir, "metrics.jsonl"), "a") as fh:
                    fh.write(json.dumps({"iter": i + 1, **safe}) + "\n")
                if log_fn:
                    log_fn(i + 1, m)
                else:
                    print(f"[{i + 1}/{t.N_iters}] " +
                          " ".join(f"{k}={v:.4g}" for k, v in m.items()))
            if (i + 1) % t.i_weights == 0:
                # Never checkpoint a NaN-poisoned state: i_weights need not be
                # a multiple of i_print, so the recovery check above may not
                # have seen this state yet. A poisoned checkpoint would be
                # restored in a loop by the recovery path until abort.
                if np.isfinite(float(metrics["loss"])):
                    ckpt.save(i + 1, jax.device_get(state))
                else:
                    print(f"[ckpt] skip save at iter {i + 1}: non-finite loss")
            if (i + 1) % t.i_testset == 0 and len(scene.poses_test):
                # Reference testset dump (run.py:987-1007): plain rgb/disp
                # renders of the held-out poses, no metrics (metrics happen on
                # the i_evaluate cadence).
                maps = render_pose_path(render_fn, eval_params(state.params),
                                        scene.poses_test, scene.hwf,
                                        render_factor=max(t.render_factor, 1),
                                        block=rblock)
                dump_eval_images(maps, os.path.join(expdir, f"testset_{i + 1}"))
            if (i + 1) % t.i_video == 0 and len(scene.render_poses):
                maps = render_pose_path(render_fn, eval_params(state.params),
                                        scene.render_poses, scene.hwf,
                                        render_factor=max(t.render_factor, 1),
                                        block=rblock)
                save_video(maps["rgb"], os.path.join(
                    expdir, f"spiral_{i + 1:06d}_rgb.mp4"))
                d = maps["disp"] / max(maps["disp"].max(), 1e-8)
                save_video(d, os.path.join(expdir, f"spiral_{i + 1:06d}_disp.mp4"))
            if (i + 1) % t.i_evaluate == 0 and len(scene.poses_test):
                maps = render_pose_path(render_fn, eval_params(state.params),
                                        scene.poses_test,
                                        scene.hwf,
                                        render_factor=max(t.render_factor, 1),
                                        block=rblock)
                gt = scene.images_test if t.render_factor <= 1 else None
                gt_masks = (getattr(scene, "masks_test", None)
                            if t.render_factor <= 1 else None)
                # eval LPIPS only with REAL VGG weights — random-feature
                # distances would masquerade as a paper metric.
                em = dump_eval_images(
                    maps, os.path.join(expdir, f"eval_images_{i + 1}"), gt=gt,
                    lpips_fn=lpips_fn if t.lpips_weights else None,
                    gt_masks=gt_masks)
                if em["psnr"] is not None:
                    extra = "".join(
                        f" {k}={em[k]:.4g}" for k in
                        ("lpips", "psnr_masked", "psnr_unmasked")
                        if em[k] is not None)
                    print(f"[{i + 1}/{t.N_iters}] eval_psnr={em['psnr']:.2f}"
                          f"{extra} (held-out, {len(scene.poses_test)} views)")
                    last_eval = {f"eval_{k}": v for k, v in em.items()
                                 if v is not None}
                    with open(os.path.join(expdir, "metrics.jsonl"), "a") as fh:
                        fh.write(json.dumps({"iter": i + 1, **last_eval}) + "\n")

    finally:
        # Restore the caller's handlers even when the loop dies
        # (NaN-restore abort, eval exception): leaving the
        # flag-setter installed would silently swallow Ctrl-C for
        # the rest of the process. A None handler means non-Python
        # code installed it - signal.signal() rejects None.
        for _s, _h in _old.items():
            if _h is not None:
                _signal.signal(_s, _h)
    ckpt.save(int(state.step), jax.device_get(state))
    ckpt.close()
    return {"state": state, "render_fn": render_fn, "scene": scene,
            "history": history, "ema_params": ema_params,
            "last_eval": last_eval, "preempted": preempted}
