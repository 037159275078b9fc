import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from gbnerf_tpu.config import Config, FieldConfig, RenderConfig, TrainConfig
from gbnerf_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from gbnerf_tpu.parallel.sharded import (make_sharded_renderer,
                                         make_sharded_train_step)
from gbnerf_tpu.train.state import create_train_state
from gbnerf_tpu.train.step import make_render_fn

# Heavyweight module (SD stacks / SPMD compiles / training loops):
# deselected from the default fast run (pytest.ini); run with -m slow.
pytestmark = pytest.mark.slow



# function-scoped: the sharded step DONATES the state buffers (memory
# hygiene in production); a shared fixture would hand later tests deleted
# arrays.
@pytest.fixture
def setup():
    cfg = Config(
        field=FieldConfig(no_tcnn=True, netdepth=2, netwidth=32,
                          netdepth_fine=2, netwidth_fine=32, multires=4,
                          multires_views=2),
        render=RenderConfig(N_samples=8, N_importance=4, perturb=0.0,
                            raw_noise_std=0.0),
        train=TrainConfig(N_rand=64),
    )
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh()
    return cfg, state, coarse, fine, mesh


def _batch(key, n):
    o = jax.random.normal(key, (n, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t3 = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    return {"o": o, "d": d, "target": t3}


def test_mesh_has_8_devices(setup):
    _, _, _, _, mesh = setup
    assert mesh.devices.size == 8


def test_sharded_step_matches_unsharded(setup):
    cfg, state, coarse, fine, mesh = setup
    _step, jit_step, (repl, shard) = make_sharded_train_step(
        cfg, coarse, fine, 1.2, 5.3, mesh)
    key = jax.random.PRNGKey(3)
    batch = {"clf": _batch(key, 64), "inp": None, "depth": None}
    batch["clf"]["target"] = batch["clf"]["target"]

    # unsharded reference
    s0, m0 = _step(state, batch, jax.random.PRNGKey(9))

    # sharded
    state_sh = jax.device_put(state, jax.tree_util.tree_map(
        lambda _: repl, state))
    batch_sh = jax.device_put(batch, jax.tree_util.tree_map(
        lambda _: shard, batch))
    step = jit_step(state_sh, batch_sh)
    s1, m1 = step(state_sh, batch_sh, jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_renderer_matches_unsharded(setup):
    cfg, state, coarse, fine, mesh = setup
    render = make_render_fn(cfg, coarse, fine, 1.2, 5.3)
    sharded = make_sharded_renderer(cfg, coarse, fine, 1.2, 5.3, mesh)
    key = jax.random.PRNGKey(5)
    b = _batch(key, 128)
    out_ref = render(state.params, b["o"], b["d"], None, train=False)
    out_sh = sharded(state.params, b["o"], b["d"])
    # atol 1e-4: eager vs jit fusion changes rounding at the ~1.5e-5 level
    # (rgb scale ~1); the check is cross-device consistency, not bitwise.
    np.testing.assert_allclose(np.asarray(out_ref.rgb),
                               np.asarray(out_sh["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_ref.depth),
                               np.asarray(out_sh["depth"]), atol=1e-4)


def test_sharded_step_2d_mesh_matches_unsharded(setup):
    """Hierarchical (dcn, data) mesh — the multi-host layout — must produce
    the same step as unsharded execution."""
    from gbnerf_tpu.parallel.mesh import make_mesh_2d

    cfg, state, coarse, fine, _ = setup
    mesh2 = make_mesh_2d(2, 4)
    assert mesh2.shape == {"dcn": 2, "data": 4}
    _step, jit_step, (repl, shard) = make_sharded_train_step(
        cfg, coarse, fine, 1.2, 5.3, mesh2, axis=("dcn", "data"))
    key = jax.random.PRNGKey(3)
    batch = {"clf": _batch(key, 64), "inp": None, "depth": None}

    s0, m0 = _step(state, batch, jax.random.PRNGKey(9))
    loss0 = float(m0["loss"])

    state_sh = jax.device_put(state, jax.tree_util.tree_map(
        lambda _: repl, state))
    batch_sh = jax.device_put(batch, jax.tree_util.tree_map(
        lambda _: shard, batch))
    step = jit_step(state_sh, batch_sh)
    s1, m1 = step(state_sh, batch_sh, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(m1["loss"]), loss0, rtol=1e-5)
    l0 = jax.tree_util.tree_leaves(s0.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stage2_step_sharded_matches_unsharded():
    """Stage-2 (masked inpainting + guidance) under SPMD: the mesh-sharded
    step must reproduce the single-device step (params replicated, ray
    streams sharded; see make_train_step_stage2 mesh kwarg)."""
    import dataclasses

    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.train.step import make_train_step_stage2

    H, W, focal = 12, 16, 14.0
    n_img, K, n_rand = 2, 16, 32
    cfg = Config(
        field=FieldConfig(no_tcnn=True, netdepth=2, netwidth=32,
                          netdepth_fine=2, netwidth_fine=32, multires=4,
                          multires_views=2),
        render=RenderConfig(N_samples=8, N_importance=4, perturb=0.0,
                            raw_noise_std=0.0),
        train=TrainConfig(N_rand=n_rand),
        guidance=GuidanceConfig(is_rgb_guidance=True,
                                is_normal_guidance=True,
                                is_colla_guidance=False,
                                normal_start_iter=0,
                                normalmap_render_factor=4),
    )
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))

    def toy_guidance(step_i, combin, normal_map, mask, rng, **kw):
        loss = jnp.mean(combin ** 2)
        if normal_map is not None:
            loss = loss + jnp.mean(normal_map ** 2)
        return loss

    k = jax.random.PRNGKey(6)
    xy = jnp.stack(
        [jax.random.randint(k, (n_img, K), 0, W),
         jax.random.randint(jax.random.fold_in(k, 1), (n_img, K), 0, H)],
        axis=-1)
    scene_dev = {
        "images": jax.random.uniform(k, (n_img, H, W, 3)),
        "masks": (jax.random.uniform(jax.random.fold_in(k, 2),
                                     (n_img, H, W)) < 0.3).astype(jnp.float32),
        "mask_coords": xy,
        "mask_valid": jnp.ones((n_img, K), bool),
        "poses": jnp.tile(jnp.eye(4)[None, :3, :4], (n_img, 1, 1)),
    }

    def stream(kk, c):
        o = jax.random.normal(kk, (n_rand, 3)) * 0.1
        d = jax.random.normal(jax.random.fold_in(kk, 3), (n_rand, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return {"o": o, "d": d,
                "target": jax.random.uniform(jax.random.fold_in(kk, 4),
                                             (n_rand, c))}

    banks_dev = {"rgb_clf": stream(jax.random.fold_in(k, 5), 3),
                 "inp": stream(jax.random.fold_in(k, 6), 1),
                 "depth": stream(jax.random.fold_in(k, 7), 2)}

    args = (1.2, 5.3)
    step_1 = make_train_step_stage2(cfg, coarse, fine, *args,
                                    hwf=(H, W, focal),
                                    guidance_fn=toy_guidance)
    s0, m0 = step_1(state, scene_dev, banks_dev, jax.random.PRNGKey(8))

    mesh = make_mesh()
    step_n = make_train_step_stage2(cfg, coarse, fine, *args,
                                    hwf=(H, W, focal),
                                    guidance_fn=toy_guidance, mesh=mesh)
    s1, m1 = step_n(state, scene_dev, banks_dev, jax.random.PRNGKey(8))
    assert float(m1["sds_loss"]) > 0.0
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stage1_step_sharded_matches_unsharded():
    """Stage-1 with the mesh kwarg: sharded sampling+render reproduces the
    single-device step."""
    from gbnerf_tpu.train.step import make_train_step_stage1
    from gbnerf_tpu.train.state import TrainState

    cfg = Config(
        field=FieldConfig(no_tcnn=True, netdepth=2, netwidth=32,
                          netdepth_fine=2, netwidth_fine=32, multires=4,
                          multires_views=2),
        render=RenderConfig(N_samples=8, N_importance=4, perturb=0.0,
                            raw_noise_std=0.0),
        train=TrainConfig(N_rand=32),
    )
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(11)

    def stream(kk, c, n=256):
        o = jax.random.normal(kk, (n, 3)) * 0.1
        d = jax.random.normal(jax.random.fold_in(kk, 3), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return {"o": o, "d": d,
                "target": jax.random.uniform(jax.random.fold_in(kk, 4),
                                             (n, c))}

    banks_dev = {"rgb_clf": stream(k, 3), "inp": stream(
        jax.random.fold_in(k, 1), 1), "depth": None}

    step_1 = make_train_step_stage1(cfg, coarse, fine, 1.2, 5.3)
    s0, m0 = step_1(state, banks_dev, jax.random.PRNGKey(9))

    step_n = make_train_step_stage1(cfg, coarse, fine, 1.2, 5.3,
                                    mesh=make_mesh())
    s1, m1 = step_n(state, banks_dev, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_sharded_guidance_step_matches_unsharded():
    """Tensor-parallel guidance (parallel/tp.py): conv/dense kernels
    out-channel-sharded over a `model` mesh axis; the tiny-SD score-
    distillation step jits, runs, matches the replicated result, and the
    params are actually distributed across devices."""
    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance.stable import build_sd_modules, sd_train_step
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import VAEConfig
    from gbnerf_tpu.guidance.text import CLIPTextConfig
    from gbnerf_tpu.parallel.tp import (shard_params_tp,
                                        sharded_bytes_per_device)

    gcfg = GuidanceConfig(sd_tiny=True)
    mods = build_sd_modules(gcfg, jax.random.PRNGKey(0),
                            unet_config=UNetConfig.tiny(),
                            vae_config=VAEConfig.tiny(),
                            text_config=CLIPTextConfig.tiny(),
                            latent_size=64, dtype=jnp.float32)
    H = W = 64
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
    m = (jax.random.uniform(jax.random.PRNGKey(2), (H, W)) > 0.6).astype(
        jnp.float32)

    def loss(rgb_in, up, vp):
        def f(r):
            return sd_train_step(mods, gcfg, 700, r, m,
                                 jax.random.PRNGKey(5),
                                 embeds=mods.embeds_rgb, guidance_scale=7.5,
                                 mode="csd", unet_params=up, vae_params=vp)
        l, g = jax.value_and_grad(f)(rgb_in)
        return l, g

    l0, g0 = jax.jit(loss)(rgb, mods.unet_params, mods.vae_params)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("model",))
    up = shard_params_tp(mods.unet_params, mesh)
    vp = shard_params_tp(mods.vae_params, mesh)
    total = sum(x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(mods.unet_params))
    per_dev = sharded_bytes_per_device(up, mesh)
    assert per_dev < 0.9 * total, (per_dev, total)  # actually distributed

    l1, g1 = jax.jit(loss)(rgb, up, vp)
    assert np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=2e-5)


def test_stage2_tp_guidance_over_2d_mesh():
    """Production guidance-TP wiring (config guidance.tp → train loop):
    the stage-2 step on a (data, model) mesh with REAL tiny-SD guidance
    and the SD towers out-channel-sharded over `model` (parallel/tp.py,
    exactly what train() builds when guidance_tp > 1) reproduces the
    single-device step, and the guidance params are actually
    distributed."""
    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance import build_sd_modules, make_guidance_fn
    from gbnerf_tpu.guidance.stable import guidance_params
    from gbnerf_tpu.guidance.text import CLIPTextConfig
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import VAEConfig
    from gbnerf_tpu.parallel.tp import (shard_params_tp,
                                        sharded_bytes_per_device)
    from gbnerf_tpu.train.step import make_train_step_stage2

    H, W, focal = 12, 16, 14.0
    n_img, K, n_rand = 2, 16, 32
    gcfg = GuidanceConfig(is_rgb_guidance=True, is_normal_guidance=False,
                          sd_tiny=True, cache_masked_latents=False, tp=2)
    cfg = Config(
        field=FieldConfig(no_tcnn=True, netdepth=2, netwidth=32,
                          netdepth_fine=2, netwidth_fine=32, multires=4,
                          multires_views=2),
        render=RenderConfig(N_samples=8, N_importance=4, perturb=0.0,
                            raw_noise_std=0.0),
        train=TrainConfig(N_rand=n_rand),
        guidance=gcfg,
    )
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))

    mods = build_sd_modules(gcfg, jax.random.PRNGKey(1),
                            unet_config=UNetConfig.tiny(),
                            vae_config=VAEConfig.tiny(),
                            text_config=CLIPTextConfig.tiny(),
                            latent_size=64, dtype=jnp.float32)
    guidance_fn = make_guidance_fn(mods, gcfg, n_iters=100)
    gparams = guidance_params(mods)

    k = jax.random.PRNGKey(6)
    xy = jnp.stack(
        [jax.random.randint(k, (n_img, K), 0, W),
         jax.random.randint(jax.random.fold_in(k, 1), (n_img, K), 0, H)],
        axis=-1)
    scene_dev = {
        "images": jax.random.uniform(k, (n_img, H, W, 3)),
        "masks": (jax.random.uniform(jax.random.fold_in(k, 2),
                                     (n_img, H, W)) < 0.3).astype(jnp.float32),
        "mask_coords": xy,
        "mask_valid": jnp.ones((n_img, K), bool),
        "poses": jnp.tile(jnp.eye(4)[None, :3, :4], (n_img, 1, 1)),
    }

    def stream(kk, c):
        o = jax.random.normal(kk, (n_rand, 3)) * 0.1
        d = jax.random.normal(jax.random.fold_in(kk, 3), (n_rand, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return {"o": o, "d": d,
                "target": jax.random.uniform(jax.random.fold_in(kk, 4),
                                             (n_rand, c))}

    banks_dev = {"rgb_clf": stream(jax.random.fold_in(k, 5), 3),
                 "inp": stream(jax.random.fold_in(k, 6), 1),
                 "depth": stream(jax.random.fold_in(k, 7), 2)}

    args = (1.2, 5.3)
    step_1 = make_train_step_stage2(cfg, coarse, fine, *args,
                                    hwf=(H, W, focal),
                                    guidance_fn=guidance_fn)
    s0, m0 = step_1(state, scene_dev, banks_dev, jax.random.PRNGKey(8),
                    gparams)
    # CSD's dot-product surrogate loss may be negative; nonzero = ran.
    assert float(m0["sds_loss"]) != 0.0

    # the mesh train() builds for guidance_tp=2 on 8 devices: (4, 2)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 2), ("data", "model"))
    gp_tp = shard_params_tp(gparams, mesh)
    total = sum(x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(gparams))
    assert sharded_bytes_per_device(gp_tp, mesh) < 0.9 * total

    step_n = make_train_step_stage2(cfg, coarse, fine, *args,
                                    hwf=(H, W, focal),
                                    guidance_fn=guidance_fn, mesh=mesh)
    s1, m1 = step_n(state, scene_dev, banks_dev, jax.random.PRNGKey(8),
                    gp_tp)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["sds_loss"]),
                               float(m0["sds_loss"]), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_step_hlo_has_gradient_allreduce(setup):
    """Sharding facts, not just finiteness (VERDICT r1 #8): the compiled
    SPMD step must contain a cross-replica all-reduce (the gradient sync
    XLA inserts for replicated params ← sharded batch), and the sharded
    batch must actually be distributed: per-device shard bytes = total/8."""
    cfg, state, coarse, fine, mesh = setup
    _step, jit_step, (repl, shard) = make_sharded_train_step(
        cfg, coarse, fine, 1.2, 5.3, mesh)
    batch = {"clf": _batch(jax.random.PRNGKey(3), 64), "inp": None,
             "depth": None}
    state_sh = jax.device_put(state, jax.tree_util.tree_map(
        lambda _: repl, state))
    batch_sh = jax.device_put(batch, jax.tree_util.tree_map(
        lambda _: shard, batch))

    o = batch_sh["clf"]["o"]
    assert len(o.addressable_shards) == 8
    assert o.addressable_shards[0].data.nbytes == o.nbytes // 8

    compiled = jit_step(state_sh, batch_sh).lower(
        state_sh, batch_sh, jax.random.PRNGKey(9)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in the SPMD step"
    # the collective reduces over all 8 participants of the data axis
    assert any(x in hlo for x in
               ("replica_groups={{0,1,2,3,4,5,6,7}}",
                "replica_groups=[1,8]")), "all-reduce not over the full axis"


def test_tp_params_sharding_facts():
    """TP facts: per-device parameter bytes ≈ total/n for the out-channel
    sharded leaves (norms/biases replicated → strictly between total/n and
    total), and the compiled TP guidance forward contains collectives."""
    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance.stable import build_sd_modules, sd_train_step
    from gbnerf_tpu.guidance.text import CLIPTextConfig
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import VAEConfig
    from gbnerf_tpu.parallel.tp import (shard_params_tp,
                                        sharded_bytes_per_device)

    gcfg = GuidanceConfig(sd_tiny=True)
    mods = build_sd_modules(gcfg, jax.random.PRNGKey(0),
                            unet_config=UNetConfig.tiny(),
                            vae_config=VAEConfig.tiny(),
                            text_config=CLIPTextConfig.tiny(),
                            latent_size=64, dtype=jnp.float32)
    n = 2
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("model",))
    up = shard_params_tp(mods.unet_params, mesh)
    total = sum(x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(mods.unet_params))
    per_dev = sharded_bytes_per_device(up, mesh)
    # sharded leaves halve; replicated norm/bias leaves don't: total/n <
    # per_dev < total, and the sharded fraction should dominate (>50%).
    assert total / n < per_dev < 0.75 * total, (per_dev, total)

    rgb = jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3))
    m = jnp.zeros((64, 64))
    vp = shard_params_tp(mods.vae_params, mesh)

    def loss(r, up, vp):
        return sd_train_step(mods, gcfg, 700, r, m, jax.random.PRNGKey(5),
                             embeds=mods.embeds_rgb, guidance_scale=7.5,
                             mode="csd", unet_params=up, vae_params=vp)

    hlo = jax.jit(loss).lower(rgb, up, vp).compile().as_text()
    assert any(c in hlo for c in ("all-reduce", "all-gather",
                                  "collective-permute", "all-to-all")), \
        "TP guidance compiled without any inter-device collective"


def test_weak_scaling_constant_per_device_shard(setup):
    """Weak scaling on the virtual mesh: with N_rand = k·n_devices, the
    per-device shard shape stays constant as the mesh grows 2→4→8 (the
    SPMD program's per-chip working set is mesh-size invariant)."""
    cfg, state, coarse, fine, _ = setup
    per_dev = 16
    shapes = []
    for n in (2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("data",))
        _, jit_step, (repl, shard) = make_sharded_train_step(
            cfg, coarse, fine, 1.2, 5.3, mesh)
        batch = {"clf": _batch(jax.random.PRNGKey(3), per_dev * n),
                 "inp": None, "depth": None}
        batch_sh = jax.device_put(batch, jax.tree_util.tree_map(
            lambda _: shard, batch))
        state_sh = jax.device_put(state, jax.tree_util.tree_map(
            lambda _: repl, state))
        step = jit_step(state_sh, batch_sh)
        s1, m1 = step(state_sh, batch_sh, jax.random.PRNGKey(9))
        assert np.isfinite(float(m1["loss"]))
        shapes.append(
            batch_sh["clf"]["o"].addressable_shards[0].data.shape)
        # state was donated; rebuild for the next mesh size
        state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    assert shapes[0] == shapes[1] == shapes[2] == (per_dev, 3)


def test_lora_step_sharded_matches_unsharded():
    """Data-parallel LoRA fine-tune (the reference's HF-Accelerate DDP,
    train_dreambooth...py:491-496): the batch shards over the data axis,
    adapters/frozen towers stay replicated, and one step matches the
    unsharded result."""
    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance.stable import build_sd_modules
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import VAEConfig
    from gbnerf_tpu.guidance.text import CLIPTextConfig
    from gbnerf_tpu.train.lora_trainer import make_lora_train_step

    gcfg = GuidanceConfig(sd_tiny=True)
    mods = build_sd_modules(gcfg, jax.random.PRNGKey(0),
                            unet_config=UNetConfig.tiny(),
                            vae_config=VAEConfig.tiny(),
                            text_config=CLIPTextConfig.tiny(),
                            latent_size=64, dtype=jnp.float32)
    B, S = 8, 64
    key = jax.random.PRNGKey(1)
    batch = {
        "image": (jax.random.uniform(key, (B, S, S, 3)) * 255
                  ).astype(jnp.uint8),
        "mask": (jax.random.uniform(jax.random.fold_in(key, 1),
                                    (B, S, S)) > 0.6).astype(jnp.uint8),
        "embeds": jax.random.normal(jax.random.fold_in(key, 2), (B, 77, 32)),
        "instance_mask": None,
    }

    init_fn, step0 = make_lora_train_step(mods, rank=4, lr=1e-3)
    lora0, opt0 = init_fn(jax.random.PRNGKey(3))
    l0, _, m0 = step0(lora0, opt0, batch, jax.random.PRNGKey(4))

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    _, step1 = make_lora_train_step(mods, rank=4, lr=1e-3, mesh=mesh)
    lora1, opt1 = init_fn(jax.random.PRNGKey(3))
    # feed an ACTUALLY distributed batch (one sample per device)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))
    batch_s = {k: (jax.device_put(v, shard) if v is not None else None)
               for k, v in batch.items()}
    assert len(batch_s["image"].addressable_shards) == jax.device_count()
    l1, _, m1 = step1(lora1, opt1, batch_s, jax.random.PRNGKey(4))

    assert np.isfinite(float(m1["loss"]))
    # The SPMD loss (grad all-reduce over ICI) equals the single-device
    # loss to float tolerance. Post-AdamW params are NOT compared: the
    # zero-init adapters produce near-zero grads whose reduction-order
    # sign flips become full ±lr steps through Adam's normalizer.
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=2e-5)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(l1))
