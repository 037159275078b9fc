import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gbnerf_tpu.config import GuidanceConfig
from gbnerf_tpu.guidance import (
    AutoencoderKL, CLIPTextConfig, CLIPTextEncoder, DiffusionSchedule,
    SDModules, Tokenizer, UNet2DCondition, UNetConfig, VAEConfig,
    build_sd_modules, cfg_combine_bsd, cfg_combine_sds, inject_gradient,
    make_guidance_fn, score_distillation_grad,
    weighted_perpendicular_aggregator, rand_poses,
)

# Heavyweight module (SD stacks / SPMD compiles / training loops):
# deselected from the default fast run (pytest.ini); run with -m slow.
pytestmark = pytest.mark.slow


# ---------- schedule ----------

def test_schedule_matches_known_sd_values():
    s = DiffusionSchedule.sd_v1()
    assert s.betas.shape == (1000,)
    np.testing.assert_allclose(s.betas[0], 0.00085, rtol=1e-5)
    np.testing.assert_allclose(s.betas[-1], 0.012, rtol=1e-5)
    # ᾱ decreasing in (0, 1)
    assert (np.diff(s.alphas_cumprod) < 0).all()
    assert 0 < s.alphas_cumprod[-1] < s.alphas_cumprod[0] < 1
    # SD's well-known ᾱ_0 = 1 - 0.00085
    np.testing.assert_allclose(s.alphas_cumprod[0], 1 - 0.00085, rtol=1e-6)


def test_add_noise_endpoints(key):
    s = DiffusionSchedule.sd_v1()
    x0 = jax.random.normal(key, (2, 4, 4, 4))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    x_early = s.add_noise(x0, noise, jnp.asarray(0))
    assert float(jnp.mean((x_early - x0) ** 2)) < 0.01
    x_late = s.add_noise(x0, noise, jnp.asarray(999))
    assert float(jnp.mean((x_late - noise) ** 2)) < 0.05


def test_annealed_t_monotone():
    s = DiffusionSchedule.sd_v1()
    ts = [int(s.annealed_t(i, (0.02, 0.98), 20000)) for i in
          (0, 1000, 5000, 20000, 50000)]
    assert ts[0] == 980
    assert all(a >= b for a, b in zip(ts, ts[1:]))
    assert ts[-1] == 20


# ---------- sds math ----------

def test_cfg_combines():
    u, t, n = jnp.ones(4), 2 * jnp.ones(4), 3 * jnp.ones(4)
    np.testing.assert_allclose(cfg_combine_sds(u, t, 7.5), 1 + 7.5 * 1.0)
    # BSD: w1*t + w3*n - w2*u
    np.testing.assert_allclose(cfg_combine_bsd(n, u, t, 1.0, 0.5, 7.5),
                               1 * 2 + 7.5 * 3 - 0.5 * 1)


def test_inject_gradient_grad_is_masked_grad(key):
    lat = jax.random.normal(key, (1, 8, 8, 4))
    g = jax.random.normal(jax.random.fold_in(key, 1), lat.shape)
    mask = (jax.random.uniform(jax.random.fold_in(key, 2), (1, 8, 8, 1)) > 0.5
            ).astype(jnp.float32)
    grad = jax.grad(lambda l: inject_gradient(l, g, mask))(lat)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g * mask), atol=1e-6)


def test_score_distillation_grad_modes(key):
    pred = jax.random.normal(key, (1, 4, 4, 4))
    noise = jax.random.normal(jax.random.fold_in(key, 1), pred.shape)
    w = 0.7
    np.testing.assert_allclose(
        np.asarray(score_distillation_grad(pred, noise, w, mode="csd")),
        np.asarray(w * pred), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(score_distillation_grad(pred, noise, w, mode="sds")),
        np.asarray(w * pred - noise), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(score_distillation_grad(pred, noise, w, mode="sds",
                                           standard_sds=True)),
        np.asarray(w * (pred - noise)), atol=1e-6)


def test_perpneg_aggregator(key):
    B = 2
    main = jax.random.normal(key, (B, 4, 4, 4))
    aux = jax.random.normal(jax.random.fold_in(key, 1), (B, 4, 4, 4))
    stacked = jnp.concatenate([main, aux])
    w = jnp.ones((B,)) * 0.5
    out = weighted_perpendicular_aggregator(stacked, w, B)
    # residual of aux must be ⟂ main
    perp = out - main
    dots = jnp.sum(perp * main, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(dots), 0.0, atol=1e-3)


# ---------- models (tiny configs) ----------

def test_unet_forward_shapes(key):
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    x = jnp.zeros((2, 16, 16, 9))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = unet.init(key, x, jnp.zeros(()), ctx)["params"]
    out = unet.apply({"params": params}, x, jnp.asarray([5, 500]), ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_roundtrip_shapes(key):
    vae = AutoencoderKL(VAEConfig.tiny())
    x = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
    params = vae.init(key, x)["params"]
    z = vae.apply({"params": params}, x, method=AutoencoderKL.encode)
    assert z.shape == (1, 4, 4, 4)
    y = vae.apply({"params": params}, z, method=AutoencoderKL.decode)
    assert y.shape == (1, 32, 32, 3)


def test_vae_encode_is_differentiable(key):
    vae = AutoencoderKL(VAEConfig.tiny())
    x = jax.random.uniform(key, (1, 32, 32, 3))
    params = vae.init(key, x)["params"]

    def f(x):
        return jnp.sum(vae.apply({"params": params}, x,
                                 method=AutoencoderKL.encode) ** 2)

    g = jax.grad(f)(x)
    assert float(jnp.abs(g).max()) > 0


def test_text_encoder_and_tokenizer(key):
    tcfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(tcfg)
    tok = Tokenizer(max_length=tcfg.max_length, vocab_size=tcfg.vocab_size)
    ids = tok(["a stone park bench", ""])
    assert ids.shape == (2, 77)
    ids = np.clip(ids, 0, tcfg.vocab_size - 1)
    params = enc.init(key, jnp.asarray(ids))["params"]
    out = enc.apply({"params": params}, jnp.asarray(ids))
    assert out.shape == (2, 77, tcfg.width)
    # causality: changing a late token must not affect earlier positions
    ids2 = ids.copy()
    ids2[0, 50] = (ids2[0, 50] + 1) % tcfg.vocab_size
    out2 = enc.apply({"params": params}, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out[0, :50]),
                               np.asarray(out2[0, :50]), atol=1e-5)
    assert not np.allclose(np.asarray(out[0, 50:]), np.asarray(out2[0, 50:]))


def test_rand_poses(key):
    poses, dirs, thetas, phis, radii = rand_poses(key, 16)
    assert poses.shape == (16, 4, 4)
    # orthonormal rotation
    R = np.asarray(poses[:, :3, :3])
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    assert set(np.asarray(dirs).tolist()) <= {0, 1, 2, 3, 4, 5}


# ---------- end-to-end tiny guidance ----------

@pytest.fixture(scope="module")
def tiny_mods():
    gcfg = GuidanceConfig(prompt="a thing", prompt_normal="a normal map",
                          negative_prompt="bad")
    mods = build_sd_modules(
        gcfg, jax.random.PRNGKey(0),
        unet_config=UNetConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig(vocab_size=49408, width=32, layers=2,
                                   heads=2),
        latent_size=64, dtype=jnp.float32)
    return gcfg, mods


def test_guidance_fn_end_to_end(tiny_mods, key):
    gcfg, mods = tiny_mods
    fn = make_guidance_fn(mods, gcfg)
    H = W = 24
    rgb = jax.random.uniform(key, (H, W, 3))
    normal = jax.random.uniform(jax.random.fold_in(key, 1), (12, 12, 3))
    mask = (jax.random.uniform(jax.random.fold_in(key, 2), (H, W)) > 0.7
            ).astype(jnp.float32)
    loss = fn(jnp.asarray(1000), rgb, normal, mask, jax.random.fold_in(key, 3))
    assert np.isfinite(float(loss))

    # gradient flows back to the rendered composite through the VAE
    g = jax.grad(lambda r: fn(jnp.asarray(1000), r, normal, mask,
                              jax.random.fold_in(key, 3)))(rgb)
    assert float(jnp.abs(g).max()) > 0


def test_guidance_normal_gated_by_start_iter(tiny_mods, key):
    gcfg, mods = tiny_mods
    fn = make_guidance_fn(mods, gcfg)
    H = W = 16
    rgb = jax.random.uniform(key, (H, W, 3))
    normal = jax.random.uniform(jax.random.fold_in(key, 1), (8, 8, 3))
    mask = jnp.ones((H, W))
    k = jax.random.fold_in(key, 2)
    early = float(fn(jnp.asarray(0), rgb, normal, mask, k))
    late = float(fn(jnp.asarray(10000), rgb, normal, mask, k))
    # same rng: the difference must be exactly the gated normal term
    assert early != late


def test_guidance_normal_anneal_restarts_at_start_iter(tiny_mods, key,
                                                       monkeypatch):
    """The normal modality's t-anneal runs on (i − normal_start), not i
    (reference sd_utils.py:267 √((i − normal_start)/20000)): at
    i = normal_start_iter the normal branch must see step 0 → max noise."""
    import gbnerf_tpu.guidance.stable as stable

    gcfg, mods = tiny_mods
    seen = []

    real = stable.sd_train_step

    def spy(mods_, gcfg_, step_i, *a, **kw):
        seen.append(int(step_i))
        return real(mods_, gcfg_, step_i, *a, **kw)

    monkeypatch.setattr(stable, "sd_train_step", spy)
    fn = stable.make_guidance_fn(mods, gcfg)
    H = W = 16
    rgb = jax.random.uniform(key, (H, W, 3))
    normal = jax.random.uniform(jax.random.fold_in(key, 1), (8, 8, 3))
    mask = jnp.ones((H, W))
    i = gcfg.normal_start_iter  # 500
    fn(jnp.asarray(i), rgb, normal, mask, jax.random.fold_in(key, 2))
    assert seen == [i, 0], seen  # rgb sees i; normal sees i − start = 0
    # and step 0 maps to the max timestep of the range
    t0 = int(mods.schedule.annealed_t(0, gcfg.t_range, gcfg.anneal_iters))
    assert t0 == mods.schedule.step_range(gcfg.t_range)[1]


def test_downsample_padding_torch_oracle():
    """Padding-convention parity against torch (the reference's runtime):
    VAE downsample == F.pad(x,(0,1,0,1)) + conv2d stride 2 (diffusers
    AutoencoderKL, downsample_padding=0); UNet downsample == conv2d
    stride 2 padding=1 (down blocks, downsample_padding=1)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from gbnerf_tpu.guidance.blocks import Downsample2D

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    w = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))

    for asym in (True, False):
        mod = Downsample2D(8, asymmetric=asym)
        params = {"conv": {"kernel": jnp.asarray(w),
                           "bias": jnp.zeros(8)}}
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

        if asym:
            ref = F.conv2d(F.pad(xt, (0, 1, 0, 1)), wt, stride=2)
        else:
            ref = F.conv2d(xt, wt, stride=2, padding=1)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        assert got.shape == ref.shape, (asym, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_progressive_ranges_schedule():
    """progressive_view widens from the default view to the full range
    (reference nerf/utils.py:264-273, r = min(1, init + 2·ratio))."""
    import dataclasses as dc

    from gbnerf_tpu.guidance.orchestrator import progressive_ranges

    g = GuidanceConfig(progressive_view=True, progressive_view_init_ratio=0.2,
                       exp_start_iter=0, exp_end_iter=1000,
                       default_polar=90.0, default_azimuth=0.0,
                       default_radius=3.25,
                       theta_range=(45.0, 105.0), phi_range=(-180.0, 180.0),
                       radius_range=(3.0, 3.5))
    th0, ph0, _ = progressive_ranges(0, g, 1000)
    # r = 0.2 at step 0: 20% of the way from the default center to full
    assert abs(float(ph0[0]) - (-36.0)) < 1e-4
    assert abs(float(th0[0]) - (90.0 * 0.8 + 45.0 * 0.2)) < 1e-4
    thF, phF, radF = progressive_ranges(500, g, 1000)  # r = 1.2 → clamped 1
    assert abs(float(phF[0]) - (-180.0)) < 1e-4
    assert abs(float(thF[1]) - 105.0) < 1e-4
    assert abs(float(radF[1]) - 3.5) < 1e-4
    # off → static python tuples
    g_off = dc.replace(g, progressive_view=False)
    assert progressive_ranges(0, g_off, 1000) == (
        g.theta_range, g.phi_range, g.radius_range)


def test_perpneg_guidance_path(tiny_mods, key):
    """gcfg.perpneg routes the RGB modality through azimuth-conditioned
    Perp-Neg aggregation (rand_poses → adjust_text_embeddings →
    sd_train_step_perpneg); loss differs from the plain CSD path, stays
    finite, and is differentiable through the composite."""
    import dataclasses as dc

    gcfg, mods = tiny_mods
    e = mods.embeds_rgb
    mods_p = dc.replace(mods, embeds_dir={"front": e[2], "side": e[1],
                                          "back": e[0]})
    gcfg_p = dc.replace(gcfg, perpneg=True, progressive_view=True,
                        is_normal_guidance=False)
    gcfg_0 = dc.replace(gcfg, is_normal_guidance=False)
    fn_p = make_guidance_fn(mods_p, gcfg_p, n_iters=1000)
    fn_0 = make_guidance_fn(mods, gcfg_0, n_iters=1000)

    H = W = 16
    rgb = jax.random.uniform(key, (H, W, 3))
    mask = jnp.ones((H, W))
    k = jax.random.fold_in(key, 1)
    lp = float(fn_p(jnp.asarray(10), rgb, None, mask, k))
    l0 = float(fn_0(jnp.asarray(10), rgb, None, mask, k))
    assert np.isfinite(lp) and lp != l0
    # progressive_view makes the azimuth distribution step-dependent (the
    # widening ranges change the same-rng draw)
    lp2 = float(fn_p(jnp.asarray(900), rgb, None, mask, k))
    assert np.isfinite(lp2) and lp2 != lp
    g = jax.grad(lambda r: fn_p(jnp.asarray(10), r, None, mask, k))(rgb)
    assert float(jnp.abs(g).max()) > 0


def test_masked_latents_cache_exact(tiny_mods, key):
    """Passing precomputed conditioning latents is BITWISE identical to the
    in-step encode when the cache uses the step's own encode key and the
    same image (plumbing exactness; the production divergence — resize
    bleed + frozen posterior draw — is documented at
    precompute_masked_latents)."""
    from gbnerf_tpu.guidance.stable import (AutoencoderKL, _resize,
                                            sd_train_step)

    gcfg, mods = tiny_mods
    H = W = 24
    rgb = jax.random.uniform(key, (H, W, 3))
    mask = (jax.random.uniform(jax.random.fold_in(key, 2), (H, W)) > 0.7
            ).astype(jnp.float32)
    rng = jax.random.fold_in(key, 3)
    base = float(sd_train_step(mods, gcfg, 500, rgb, mask, rng,
                               embeds=mods.embeds_rgb, guidance_scale=7.5))
    k_enc2 = jax.random.split(rng, 3)[2]      # the step's own encode key
    S = mods.latent_size
    rgb512 = _resize(rgb[None], S) * 2.0 - 1.0
    m512 = _resize(jnp.abs(mask)[None, ..., None], S)
    ml = mods.vae.apply({"params": mods.vae_params},
                        rgb512 * (m512 < 0.5), k_enc2,
                        method=AutoencoderKL.encode)
    cached = float(sd_train_step(mods, gcfg, 500, rgb, mask, rng,
                                 embeds=mods.embeds_rgb, guidance_scale=7.5,
                                 masked_latents=ml))
    assert cached == base


def test_precompute_masked_latents_table(tiny_mods, key):
    from gbnerf_tpu.guidance.stable import precompute_masked_latents

    gcfg, mods = tiny_mods
    imgs = jax.random.uniform(key, (3, 20, 28, 3))
    masks = (jax.random.uniform(jax.random.fold_in(key, 1),
                                (3, 20, 28)) > 0.6).astype(jnp.float32)
    tbl = precompute_masked_latents(mods, imgs, masks, rng=key)
    assert tbl.shape == (3, mods.latent_res, mods.latent_res, 4)
    assert np.isfinite(np.asarray(tbl)).all()


def test_per_modality_triples_threaded(tiny_mods, key, monkeypatch):
    """make_guidance_fn threads the PER-MODALITY CSD triples: the RGB
    dispatch gets rgb_w1/w2/w3 and the normal dispatch normal_w1/w2/w3
    with the GLOBAL iteration as its use_negative gate step (reference
    nerf/utils.py:294,310 — VERDICT r3 #1)."""
    import dataclasses as dc

    import gbnerf_tpu.guidance.stable as stable

    gcfg, mods = tiny_mods
    gcfg = dc.replace(gcfg, use_csd=True)
    seen = []
    real = stable.sd_train_step

    def spy(mods_, gcfg_, step_i, *a, **kw):
        seen.append((kw.get("w_triple"), kw.get("gate_step")))
        return real(mods_, gcfg_, step_i, *a, **kw)

    monkeypatch.setattr(stable, "sd_train_step", spy)
    fn = stable.make_guidance_fn(mods, gcfg)
    H = W = 16
    rgb = jax.random.uniform(key, (H, W, 3))
    normal = jax.random.uniform(jax.random.fold_in(key, 1), (8, 8, 3))
    i = gcfg.normal_start_iter + 100
    fn(jnp.asarray(i), rgb, normal, jnp.ones((H, W)),
       jax.random.fold_in(key, 2))
    assert seen == [
        ((gcfg.rgb_w1, gcfg.rgb_w2, gcfg.rgb_w3), None),
        ((gcfg.normal_w1, gcfg.normal_w2, gcfg.normal_w3), i),
    ], seen


def test_use_negative_gate(tiny_mods, key):
    """Until GLOBAL iteration i > use_negative the uncond slot is the null
    embedding (reference sd_utils.py:354-357: negative_prompt=None →
    encoded as \"\"); afterwards the negative prompt is live."""
    import dataclasses as dc

    from gbnerf_tpu.guidance.stable import sd_train_step

    gcfg, mods = tiny_mods
    g10 = dc.replace(gcfg, use_negative=10)
    H = W = 16
    rgb = jax.random.uniform(key, (H, W, 3))
    mask = jnp.ones((H, W))
    rng = jax.random.fold_in(key, 1)
    E = mods.embeds_rgb                      # null != uncond (neg="bad")
    assert not np.allclose(np.asarray(E[0]), np.asarray(E[1]))
    E_nulled = E.at[1].set(E[0])

    def step(g, embeds, i, mode):
        return float(sd_train_step(mods, g, i, rgb, mask, rng,
                                   embeds=embeds, guidance_scale=7.5,
                                   mode=mode))

    for mode in ("csd", "sds"):
        # gated: reference i = step + 1 <= use_negative (run.py:1230 makes
        # i 1-based) → behaves as if uncond were null. Boundary: our step 9
        # is reference i=10, the last gated iteration at use_negative=10.
        assert step(g10, E, 9, mode) == step(gcfg, E_nulled, 9, mode)
        # past the gate (step 10 = reference i=11 > 10): negative is live
        assert step(g10, E, 10, mode) == step(gcfg, E, 10, mode)
        # and the gate actually changes the value when embeds differ
        assert step(g10, E, 9, mode) != step(gcfg, E, 9, mode)


def test_lambda_guidance_scales_loss_and_grad(tiny_mods, key):
    """lambda_guidance scales the injected guidance loss (and hence the
    latent gradient) linearly; default 1.0 = reference shipped behavior."""
    import dataclasses as dc

    from gbnerf_tpu.guidance.stable import sd_train_step

    gcfg, mods = tiny_mods
    g2 = dc.replace(gcfg, lambda_guidance=2.0)
    H = W = 16
    rgb = jax.random.uniform(key, (H, W, 3))
    mask = jnp.ones((H, W))
    rng = jax.random.fold_in(key, 1)

    def loss(g, r):
        return sd_train_step(mods, g, 500, r, mask, rng,
                             embeds=mods.embeds_rgb, guidance_scale=7.5)

    l1, l2 = float(loss(gcfg, rgb)), float(loss(g2, rgb))
    np.testing.assert_allclose(l2, 2.0 * l1, rtol=1e-6)
    g1 = jax.grad(lambda r: loss(gcfg, r))(rgb)
    gg2 = jax.grad(lambda r: loss(g2, r))(rgb)
    np.testing.assert_allclose(np.asarray(gg2), 2.0 * np.asarray(g1),
                               rtol=1e-5, atol=1e-7)
