import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gbnerf_tpu.config import (Config, DataConfig, FieldConfig, GuidanceConfig,
                               RenderConfig, TrainConfig)
from gbnerf_tpu.data.llff import LLFFScene
from gbnerf_tpu.data.rays_bank import build_ray_banks
from gbnerf_tpu.train import (create_train_state, make_train_step_stage1,
                              make_train_step_stage2, CheckpointManager)
from gbnerf_tpu.train.loop import banks_to_device, scene_to_device

# Heavyweight module (SD stacks / SPMD compiles / training loops):
# deselected from the default fast run (pytest.ini); run with -m slow.
pytestmark = pytest.mark.slow



def tiny_config(**train_kw):
    return Config(
        field=FieldConfig(no_tcnn=True, netdepth=2, netwidth=32,
                          netdepth_fine=2, netwidth_fine=32, multires=4,
                          multires_views=2),
        render=RenderConfig(N_samples=8, N_importance=4, perturb=1.0,
                            raw_noise_std=0.0, white_bkgd=False),
        data=DataConfig(colmap_depth=False, depth_lambda=0.1),
        guidance=GuidanceConfig(is_normal_guidance=False,
                                normalmap_render_factor=2),
        train=TrainConfig(N_rand=32, lrate=5e-3, lrate_decay=10, **train_kw),
    )


def synthetic_scene(n_img=3, H=12, W=16):
    rng = np.random.default_rng(0)
    poses = []
    for k in range(n_img):
        th = 2 * np.pi * k / n_img
        pos = np.array([2 * np.sin(th), 0.0, 2 * np.cos(th)], np.float32)
        z = pos / np.linalg.norm(pos)          # camera looks at origin (-z fwd)
        up = np.array([0, 1, 0], np.float32)
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.stack([x, y, z, pos], 1).astype(np.float32)
        hwf = np.array([[H], [W], [20.0]], np.float32)
        poses.append(np.concatenate([c2w, hwf], 1))
    poses = np.stack(poses)
    images = rng.random((n_img, H, W, 3)).astype(np.float32) * 0.5 + 0.25
    masks = np.zeros((n_img, H, W), np.float32)
    masks[:, 3:6, 4:8] = 1.0
    depths = rng.random((n_img, H, W)).astype(np.float32)
    return LLFFScene(images=images, masks=masks, inpainted_depths=depths,
                     poses=poses, poses_test=poses[:1], bds=np.array([[1.0, 4.0]]),
                     render_poses=poses[:2], hwf=(H, W, 20.0),
                     near=0.5, far=4.0)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    scene = synthetic_scene()
    banks = build_ray_banks(scene.images, scene.masks, scene.inpainted_depths,
                            scene.poses, scene.hwf[2], None)
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, scene, banks, state, coarse, fine


def test_stage1_loss_decreases(setup):
    cfg, scene, banks, state, coarse, fine = setup
    step = make_train_step_stage1(cfg, coarse, fine, scene.near, scene.far)
    banks_dev = banks_to_device(banks)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(60):
        rng, k = jax.random.split(rng)
        state, m = step(state, banks_dev, k)
        if first is None:
            first = float(m["img_loss"])
    last = float(m["img_loss"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_stage2_step_runs(setup):
    cfg, scene, banks, state, coarse, fine = setup
    step = make_train_step_stage2(cfg, coarse, fine, scene.near, scene.far,
                                  scene.hwf, guidance_fn=None)
    out = step(state, scene_to_device(scene, banks), banks_to_device(banks),
               jax.random.PRNGKey(2))
    state2, m = out
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == int(state.step) + 1


def test_stage2_with_dummy_guidance(setup):
    cfg, scene, banks, state, coarse, fine = setup
    cfg = dataclasses.replace(
        cfg, guidance=dataclasses.replace(cfg.guidance,
                                          is_normal_guidance=True))
    calls = {}

    def dummy_guidance(step_i, combin, normal_map, mask, rng):
        # Shapes must match the view geometry; loss must be differentiable.
        calls["combin"] = combin.shape
        calls["normal"] = None if normal_map is None else normal_map.shape
        return jnp.mean(combin ** 2) + (0.0 if normal_map is None
                                        else jnp.mean(normal_map ** 2))

    step = make_train_step_stage2(cfg, coarse, fine, scene.near, scene.far,
                                  scene.hwf, guidance_fn=dummy_guidance)
    state2, m = step(state, scene_to_device(scene, banks),
                     banks_to_device(banks), jax.random.PRNGKey(3))
    H, W, _ = scene.hwf
    assert calls["combin"] == (H, W, 3)
    assert calls["normal"] == (H // 2, W // 2, 3)
    assert np.isfinite(float(m["sds_loss"]))
    assert float(m["sds_loss"]) > 0


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, scene, banks, state, coarse, fine = setup
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, jax.device_get(state))
    # restore into a fresh state with different values
    state2, _, _ = create_train_state(cfg, jax.random.PRNGKey(42))
    restored = mgr.restore(state2)
    mgr.close()
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_stage1_step_with_frozen_alpha_model(setup):
    """--alpha_model_path path: frozen sigma params ride as a jit ARGUMENT
    (params["alpha"]), the step runs finite, and different alpha params
    change the loss (the frozen field is actually consulted)."""
    cfg, scene, banks, state, coarse, fine = setup
    amodel = fine if fine is not None else coarse
    _, _, afine = create_train_state(cfg, jax.random.PRNGKey(7))
    # two different frozen-sigma parameter sets
    s_a, _, _ = create_train_state(cfg, jax.random.PRNGKey(8))
    s_b, _, _ = create_train_state(cfg, jax.random.PRNGKey(9))
    ap_a = s_a.params["fine" if fine is not None else "coarse"]
    ap_b = s_b.params["fine" if fine is not None else "coarse"]

    step = make_train_step_stage1(cfg, coarse, fine, scene.near, scene.far,
                                  alpha=(amodel, ap_a))
    banks_dev = banks_to_device(banks)
    st1, m1 = step(state, banks_dev, jax.random.PRNGKey(3), ap_a)
    assert np.isfinite(float(m1["loss"]))
    _, m2 = step(state, banks_dev, jax.random.PRNGKey(3), ap_b)
    assert float(m1["loss"]) != float(m2["loss"])  # alpha params are live args
    # trainable params updated
    da = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(st1.params)))
    assert da > 0


def test_nan_recovery_restores_then_aborts(tmp_path):
    """Failure recovery (beyond reference): non-finite loss triggers a
    checkpoint/init restore with a re-forked rng; persistently-NaN training
    aborts cleanly after train.nan_restarts restores."""
    from gbnerf_tpu.train.loop import train

    cfg = tiny_config(N_iters=20, i_print=2, i_weights=1000, i_video=1000,
                      i_evaluate=1000, i_testset=1000,
                      basedir=str(tmp_path), expname="nanrun",
                      nan_restarts=2)
    cfg = dataclasses.replace(
        cfg, guidance=dataclasses.replace(cfg.guidance,
                                          is_rgb_guidance=True,
                                          is_normal_guidance=False))
    scene = synthetic_scene()

    def poison_guidance(step_i, combin, normal_map, mask, rng, **kw):
        return jnp.float32(jnp.nan) * jnp.mean(combin)

    with pytest.raises(SystemExit, match="non-finite"):
        train(cfg, guidance_fn=poison_guidance, scene=scene)


def test_nan_recovery_disabled_trains_through(tmp_path):
    """nan_restarts=0 disables the recovery branch entirely."""
    from gbnerf_tpu.train.loop import train

    cfg = tiny_config(N_iters=6, i_print=2, i_weights=1000, i_video=1000,
                      i_evaluate=1000, i_testset=1000,
                      basedir=str(tmp_path), expname="okrun",
                      nan_restarts=0)
    scene = synthetic_scene()
    out = train(cfg, scene=scene)
    assert np.isfinite(float(out["history"][-1][1]["loss"]))


def test_ndc_training_and_render(setup):
    """no_ndc=False end-to-end: rays are NDC-reparameterized inside the
    render fn (reference run.py:1711-1723, near/far → 0/1) and a training
    step optimizes. LLFF-forward-facing convention: rays look down −z."""
    from gbnerf_tpu.train.step import make_render_fn

    cfg, scene, banks, state, coarse, fine = setup
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, no_ndc=False))

    # hwf is mandatory for the NDC frustum
    with pytest.raises(ValueError, match="hwf"):
        make_render_fn(cfg, coarse, fine, scene.near, scene.far)

    step = make_train_step_stage1(cfg, coarse, fine, scene.near, scene.far,
                                  hwf=scene.hwf)
    banks_dev = banks_to_device(banks)
    rng = jax.random.PRNGKey(4)
    first = None
    for _ in range(30):
        rng, k = jax.random.split(rng)
        state, m = step(state, banks_dev, k)
        if first is None:
            first = float(m["img_loss"])
    assert np.isfinite(float(m["loss"]))
    assert float(m["img_loss"]) < first, (first, float(m["img_loss"]))

    # the render fn itself maps world rays through NDC and stays finite
    render = make_render_fn(cfg, coarse, fine, scene.near, scene.far,
                            hwf=scene.hwf)
    o = jnp.asarray(banks.rgb_clf.rays_o[:16])
    d = jnp.asarray(banks.rgb_clf.rays_d[:16])
    out = render(state.params, o, d, None, train=False)
    assert bool(jnp.isfinite(out.rgb).all())


def _fake_depth_gts(scene, n_pts=20):
    rng = np.random.default_rng(3)
    H, W, _ = scene.hwf
    gts = []
    for _ in range(len(scene.images)):
        coord = np.stack([rng.uniform(0, W - 1, n_pts),
                          rng.uniform(0, H - 1, n_pts)], -1)
        gts.append({"coord": coord.astype(np.float32),
                    "depth": rng.uniform(1.0, 3.0, n_pts).astype(np.float32),
                    "weight": np.ones(n_pts, np.float32)})
    return gts


def test_sigma_loss_wired_stage1_and_stage2(setup):
    """train.sigma_loss_weight wires the DS-NeRF σ-likelihood on the COLMAP
    depth rays into BOTH steps (reference builds SigmaLoss at
    run.py:2122-2124; its shipped loop never sums the extra into the loss —
    divergence documented at step.py::_sigma_depth_loss)."""
    cfg, scene, banks, state, coarse, fine = setup
    banks = build_ray_banks(scene.images, scene.masks,
                            scene.inpainted_depths, scene.poses,
                            scene.hwf[2], _fake_depth_gts(scene))
    banks_dev = banks_to_device(banks)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, colmap_depth=True),
        train=dataclasses.replace(cfg.train, sigma_loss_weight=0.1))
    cfg0 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, sigma_loss_weight=0.0))

    step = make_train_step_stage1(cfg, coarse, fine, scene.near, scene.far)
    step0 = make_train_step_stage1(cfg0, coarse, fine, scene.near, scene.far)
    _, m = step(state, banks_dev, jax.random.PRNGKey(5))
    _, m0 = step0(state, banks_dev, jax.random.PRNGKey(5))
    assert float(m["sigma_loss"]) != 0.0
    assert float(m0["sigma_loss"]) == 0.0
    assert float(m["loss"]) != float(m0["loss"])  # the knob changes behavior

    step2 = make_train_step_stage2(cfg, coarse, fine, scene.near, scene.far,
                                   scene.hwf, guidance_fn=None)
    _, m2 = step2(state, scene_to_device(scene, banks), banks_dev,
                  jax.random.PRNGKey(6))
    assert float(m2["sigma_loss"]) != 0.0
    assert np.isfinite(float(m2["loss"]))


def test_steps_per_dispatch_chunked_loop(tmp_path):
    """train.steps_per_dispatch > 1: K steps run as one lax.scan dispatch;
    cadences still land on the same iterations (prints in history), EMA is
    maintained inside the chunk, and the run reaches the same step count
    with finite, decreasing loss."""
    from gbnerf_tpu.train.loop import train

    scene = synthetic_scene()
    kw = dict(N_iters=12, i_print=4, i_weights=1000, i_video=1000,
              i_evaluate=1000, i_testset=1000, basedir=str(tmp_path),
              ema_decay=0.9)
    out1 = train(tiny_config(**kw, expname="k1", steps_per_dispatch=1),
                 scene=scene)
    outk = train(tiny_config(**kw, expname="k5", steps_per_dispatch=5),
                 scene=scene)

    assert int(outk["state"].step) == int(out1["state"].step) == 12
    # history printed on the SAME iterations despite 5∤4 chunking
    assert [it for it, _ in outk["history"]] == [4, 8, 12]
    assert np.isfinite(float(outk["history"][-1][1]["loss"]))
    # EMA maintained through the scan (exists, finite, tracks params shape)
    assert outk["ema_params"] is not None
    for a, b in zip(jax.tree_util.tree_leaves(outk["ema_params"]),
                    jax.tree_util.tree_leaves(outk["state"].params)):
        assert a.shape == b.shape
        assert np.isfinite(np.asarray(a)).all()


def test_ft_path_warm_start_and_i_testset(tmp_path):
    """--ft_path warm-starts from another run's checkpoint (reference
    run.py:2075-2076, takes precedence over the latest-ckpt scan);
    i_testset dumps plain test-set renders (run.py:987-1007)."""
    from gbnerf_tpu.train.loop import train

    scene = synthetic_scene()
    kw = dict(N_iters=6, i_print=3, i_weights=6, i_video=1000,
              i_evaluate=1000, basedir=str(tmp_path))
    out1 = train(tiny_config(**kw, expname="src", i_testset=1000),
                 scene=scene)
    assert int(out1["state"].step) == 6

    cfg2 = tiny_config(N_iters=10, i_print=5, i_weights=1000, i_video=1000,
                       i_evaluate=1000, i_testset=5, basedir=str(tmp_path),
                       expname="warm",
                       ft_path=str(tmp_path / "src" / "ckpt"))
    out2 = train(cfg2, scene=scene)
    # warm-start continued from step 6 → only 4 more iters ran
    assert int(out2["state"].step) == 10
    assert [it for it, _ in out2["history"]] == [10]
    # i_testset cadence fired at 10 (testset dump, no metrics)
    assert os.path.isdir(str(tmp_path / "warm" / "testset_10" / "rgb"))


def test_sd_version_2x_rejected():
    """Only the SD1.x-inpaint topology exists; 2.x must fail loudly
    instead of mis-mapping weights (reference sd_utils.py version map)."""
    from gbnerf_tpu.guidance.stable import build_sd_modules
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import VAEConfig
    from gbnerf_tpu.guidance.text import CLIPTextConfig

    gcfg = dataclasses.replace(GuidanceConfig(), sd_version="2.1")
    with pytest.raises(NotImplementedError, match="sd_version"):
        build_sd_modules(gcfg, jax.random.PRNGKey(0),
                         unet_config=UNetConfig.tiny(),
                         vae_config=VAEConfig.tiny(),
                         text_config=CLIPTextConfig.tiny(),
                         latent_size=64)


def test_stage2_cached_masked_latents_end_to_end(tmp_path):
    """train() with the real (tiny) SD stack exercises the masked-latent
    cache path: loop precompute → scene_dev table → per-view gather in
    select_stage2_view → sd_train_step skips its conditioning encode."""
    from gbnerf_tpu.train.loop import train

    cfg = tiny_config(N_iters=4, i_print=2, i_weights=1000, i_video=1000,
                      i_evaluate=1000, i_testset=1000,
                      basedir=str(tmp_path), expname="mlcache")
    cfg = dataclasses.replace(
        cfg, guidance=dataclasses.replace(
            cfg.guidance, is_rgb_guidance=True, sd_tiny=True,
            cache_masked_latents=True,
            prompt="a thing", prompt_normal="a normal map"))
    scene = synthetic_scene()
    out = train(cfg, scene=scene)
    m = out["history"][-1][1]
    assert np.isfinite(float(m["loss"]))
    assert float(m["sds_loss"]) != 0.0


def test_preemption_graceful_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-training → loop breaks, tail checkpoint persists, and a
    rerun auto-resumes from the saved step and completes (beyond the
    reference, whose only recovery is a manual restart)."""
    import signal

    from gbnerf_tpu.train.loop import train

    cfg = tiny_config(N_iters=40, i_print=5, i_weights=1000, i_video=1000,
                      i_evaluate=1000, i_testset=1000,
                      basedir=str(tmp_path), expname="preempt")
    scene = synthetic_scene()

    def send_sigterm(i, m):
        if i >= 10:
            signal.raise_signal(signal.SIGTERM)

    out = train(cfg, scene=scene, log_fn=send_sigterm)
    assert out["preempted"]
    saved = int(out["state"].step)
    assert 10 <= saved < 40
    # handler restored: raising again must not be swallowed by the trainer
    assert signal.getsignal(signal.SIGTERM) is not None

    out2 = train(cfg, scene=scene)        # auto-resume → runs to completion
    assert not out2["preempted"]
    assert int(out2["state"].step) == 40
    assert out2["history"][0][0] > saved  # resumed, did not restart from 0
