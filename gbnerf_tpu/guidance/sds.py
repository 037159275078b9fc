"""Score distillation: SDS / CSD / Balanced Score Distillation gradients.

Parity targets (/root/reference/DS_NeRF/guidance/sd_utils.py):
  - 2-way CFG SDS: ε̂ = ε_u + s(ε_t − ε_u); grad = w(t)·ε̂ − ε
    (:497-499, :505 — note the reference's exact form `w·ε̂ − ε`, NOT the
    textbook w·(ε̂−ε); we reproduce the shipped behavior and expose the
    textbook variant behind `standard_sds`).
  - 3-way CSD/BSD: chunked (null, uncond, text);
    ε̂ = w1·ε_text + w3·ε_null − w2·ε_uncond; grad = w(t)·ε̂ (:493-496, :503).
  - collaborative combine: w1·ε_text + (w2−w1)·ε_null − w2·ε_uncond (:690).
  - gradient injection: SpecifyGradient (:29-45) returns a dummy loss whose
    backward is grad·mask into the latent graph. JAX equivalent: the
    dot-product trick — loss = Σ latents · stop_grad(grad·mask); its gradient
    w.r.t. latents is exactly grad·mask, no custom_vjp machinery needed.
  - nan_to_num on grad (:506).

The UNet/VAE weights are stop-gradiented; the differentiable path is
render → resized RGB → VAE encode → noised latents → injected gradient
(SURVEY.md §7 "BSD gradient plumbing").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cfg_combine_sds(eps_uncond, eps_text, guidance_scale: float):
    return eps_uncond + guidance_scale * (eps_text - eps_uncond)


def cfg_combine_bsd(eps_null, eps_uncond, eps_text, w1: float, w2: float,
                    w3: float):
    """Balanced score distillation 3-way combine."""
    return w1 * eps_text + w3 * eps_null - w2 * eps_uncond


def cfg_combine_colla(eps_null, eps_uncond, eps_text, w1: float, w2: float):
    """Collaborative-SDS combine (sd_utils.py:690)."""
    return w1 * eps_text + (w2 - w1) * eps_null - w2 * eps_uncond


def inject_gradient(latents, grad, mask=None):
    """Dummy scalar loss whose ∂/∂latents = grad (· mask).

    Matches SpecifyGradient semantics under jax.grad. grad is nan-scrubbed
    and stop-gradiented; mask broadcasts over the latent channels.
    """
    g = jnp.nan_to_num(grad)
    if mask is not None:
        g = g * mask
    return jnp.sum(latents * jax.lax.stop_gradient(g))


def score_distillation_grad(noise_pred, noise, w_t, *, mode: str,
                            standard_sds: bool = False):
    """The raw latent-space gradient before masking/injection.

    mode: "sds" (2-way combined pred) | "csd" (3-way combined pred).
    w_t: scalar or [B] (1 − ᾱ_t).
    """
    w = jnp.asarray(w_t)
    while w.ndim < noise_pred.ndim:
        w = w[..., None]
    if mode == "csd":
        return w * noise_pred
    if standard_sds:
        return w * (noise_pred - noise)
    return w * noise_pred - noise  # reference-exact SDS form
