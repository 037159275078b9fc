"""TPU profile of the full-size SD guidance step components."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from gbnerf_tpu.config import GuidanceConfig
from gbnerf_tpu.guidance.stable import build_sd_modules, sd_train_step
from gbnerf_tpu.guidance.vae import AutoencoderKL

def timeit_scalar(fn, *args, reps=8):
    @jax.jit
    def timed(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, reps, body, 0.0)
    float(timed(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps

gcfg = GuidanceConfig()
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
mods = build_sd_modules(gcfg, key)
print(json.dumps({"stage": "built", "s": round(time.perf_counter() - t0, 1)}), flush=True)

H = W = 512
rgb = jax.random.uniform(key, (H, W, 3))
mask = (jax.random.uniform(jax.random.fold_in(key, 1), (H, W)) > 0.7).astype(jnp.float32)

# full step: value+grad wrt rgb (training cost)
def full(i, rgb, up, vp):
    def loss_fn(r):
        return sd_train_step(mods, gcfg, 1000 + i, r, mask,
                             jax.random.PRNGKey(7), embeds=mods.embeds_rgb,
                             guidance_scale=7.5, mode="csd",
                             unet_params=up, vae_params=vp)
    l, g = jax.value_and_grad(loss_fn)(rgb + i * 1e-6)
    return l + jnp.sum(g) * 1e-9
t = timeit_scalar(full, rgb, mods.unet_params, mods.vae_params, reps=8)
print(json.dumps({"comp": "full_guidance_step_fwd+bwd", "ms": round(t*1e3, 1)}), flush=True)

# UNet fwd alone, B=3 9ch 64x64
lat = jax.random.normal(key, (3, 64, 64, 9))
emb = jnp.asarray(mods.embeds_rgb)
def unet_fwd(i, lat, up):
    out = mods.unet.apply({"params": up}, lat + i * 1e-6, 500.0, emb)
    return jnp.sum(out.astype(jnp.float32)) * 1e-9
t = timeit_scalar(unet_fwd, lat, mods.unet_params, reps=8)
print(json.dumps({"comp": "unet_fwd_B3", "ms": round(t*1e3, 1)}), flush=True)

# VAE encode fwd (B=1, 512^2)
img = jax.random.uniform(key, (1, 512, 512, 3))
def vae_fwd(i, img, vp):
    z = mods.vae.apply({"params": vp}, img + i * 1e-6, jax.random.PRNGKey(3),
                       method=AutoencoderKL.encode)
    return jnp.sum(z.astype(jnp.float32)) * 1e-9
t = timeit_scalar(vae_fwd, img, mods.vae_params, reps=8)
print(json.dumps({"comp": "vae_encode_fwd_B1", "ms": round(t*1e3, 1)}), flush=True)

# VAE encode fwd+bwd (differentiable path cost)
def vae_fb(i, img, vp):
    def f(x):
        z = mods.vae.apply({"params": vp}, x, jax.random.PRNGKey(3),
                           method=AutoencoderKL.encode)
        return jnp.sum(z.astype(jnp.float32))
    l, g = jax.value_and_grad(f)(img + i * 1e-6)
    return l * 1e-9 + jnp.sum(g) * 1e-12
t = timeit_scalar(vae_fb, img, mods.vae_params, reps=8)
print(json.dumps({"comp": "vae_encode_fwd+bwd_B1", "ms": round(t*1e3, 1)}), flush=True)
