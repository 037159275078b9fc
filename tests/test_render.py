import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gbnerf_tpu.core import (
    raw2outputs, render_rays, render_rays_blocked, NeRFMLP, make_field_fn,
)


def oracle_raw2outputs(raw, z_vals, rays_d, white_bkgd=False):
    """Numpy oracle for alpha compositing (reference semantics)."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1 / (1 + np.exp(-raw[..., :3]))
    alpha = 1 - np.exp(-np.maximum(raw[..., 3], 0) * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1 - alpha[..., :-1] + 1e-10], -1),
        -1)
    w = alpha * trans
    rgb_map = (w[..., None] * rgb).sum(-2)
    depth = (w * z_vals).sum(-1)
    acc = w.sum(-1)
    if white_bkgd:
        rgb_map = rgb_map + (1 - acc[..., None])
    return rgb_map, acc, depth, w


def test_raw2outputs_matches_oracle(rng):
    raw = rng.normal(size=(16, 32, 4)).astype(np.float32)
    z = np.sort(rng.random((16, 32)).astype(np.float32) * 4 + 1, -1)
    rd = rng.normal(size=(16, 3)).astype(np.float32)
    rgb, disp, acc, w, depth, alpha = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
    orgb, oacc, odepth, ow = oracle_raw2outputs(raw, z, rd)
    np.testing.assert_allclose(np.asarray(rgb), orgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), oacc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), odepth, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w), ow, atol=1e-5)


def test_raw2outputs_opaque_first_sample():
    # A huge σ at the first sample ⇒ weight ≈ 1 there, depth ≈ z_0.
    raw = np.zeros((1, 8, 4), np.float32)
    raw[0, 0, 3] = 1e8
    z = np.linspace(1, 2, 8, dtype=np.float32)[None]
    rd = np.array([[0.0, 0.0, 1.0]], np.float32)
    _, _, acc, w, depth, _ = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
    assert np.asarray(w)[0, 0] > 0.999
    np.testing.assert_allclose(np.asarray(depth)[0], 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc)[0], 1.0, atol=1e-4)


def test_white_background():
    raw = np.zeros((1, 4, 4), np.float32)
    raw[..., 3] = -100.0  # fully transparent
    z = np.linspace(0, 1, 4, dtype=np.float32)[None]
    rd = np.array([[0.0, 0.0, 1.0]], np.float32)
    rgb, *_ = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd),
                          white_bkgd=True)
    np.testing.assert_allclose(np.asarray(rgb)[0], [1, 1, 1], atol=1e-5)


def _tiny_field(key):
    model = NeRFMLP(depth=2, width=32, skips=(1,), multires=4, multires_views=2)
    params = model.init(key, jnp.zeros((1, 3)), jnp.zeros((1, 3)))["params"]
    return model, params


@pytest.mark.slow
def test_render_rays_shapes_and_finite(key):
    model, params = _tiny_field(key)
    fn = make_field_fn(model, params)
    N = 12
    ro = jax.random.normal(key, (N, 3))
    rd = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    out = render_rays(fn, fn, ro, rd, vd,
                      jnp.full((N, 1), 2.0), jnp.full((N, 1), 6.0),
                      N_samples=16, N_importance=8, perturb=True, rng=key)
    assert out.rgb.shape == (N, 3)
    assert out.z_vals.shape == (N, 24)
    assert out.rgb0.shape == (N, 3)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert np.isfinite(np.asarray(out.disp)).all()
    assert out.z_std.shape == (N,)


@pytest.mark.slow
def test_render_rays_blocked_matches_direct(key):
    model, params = _tiny_field(key)
    fn = make_field_fn(model, params)

    def render(rays):
        ro, rd = rays["o"], rays["d"]
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        out = render_rays(fn, None, ro, rd, vd,
                          jnp.full(ro.shape[:-1] + (1,), 2.0),
                          jnp.full(ro.shape[:-1] + (1,), 6.0),
                          N_samples=8)
        return out.rgb

    N = 37  # deliberately not a multiple of the block size
    ro = jax.random.normal(key, (N, 3))
    rd = jax.random.normal(jax.random.fold_in(key, 3), (N, 3))
    direct = render({"o": ro, "d": rd})
    blocked = render_rays_blocked(render, {"o": ro, "d": rd}, block_size=16)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(blocked), atol=1e-5)


def test_render_test_ray_uniform_march():
    """render_test_ray marches n_samples UNIFORM z-values (reference
    render_test_ray, run.py:1990-1995: linspace near→far — not the render
    pipeline's hierarchical samples), queries the field at exactly those
    points, and returns relu'd σ (run_nerf_helpers.py:475)."""
    from gbnerf_tpu.train.eval import render_test_ray

    near, far, S = 2.0, 6.0, 17

    def factory(params):
        # analytic field: σ(x) = x − 4 (negative before z=4 → relu clips),
        # rgb raw 0; ray_o = 0, ray_d = +x̂ makes pts.x ≡ z
        def field_fn(pts, viewdirs, sigma_only=False):
            rgb = jnp.zeros(pts.shape[:-1] + (3,))
            return jnp.concatenate([rgb, pts[..., :1] - 4.0], -1)

        return field_fn

    prof = render_test_ray(factory, {}, jnp.zeros(3),
                           jnp.array([1.0, 0.0, 0.0]),
                           near=near, far=far, n_samples=S)
    np.testing.assert_allclose(prof["z_vals"], np.linspace(near, far, S),
                               rtol=1e-6)
    np.testing.assert_allclose(prof["sigma"],
                               np.maximum(prof["z_vals"] - 4.0, 0.0),
                               atol=1e-5)
    assert prof["weights"].shape == (S,) and prof["rgb"].shape == (3,)
    # mass sits past z=4 where σ turns on
    assert near < 4.0 < prof["depth"] < far
    assert np.isfinite(prof["weights"]).all()
