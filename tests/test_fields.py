import numpy as np
import jax
import jax.numpy as jnp

from gbnerf_tpu.core import (
    NeRFMLP, HashGridField, hash_encode, freq_encode, freq_encode_dim, sh_encode,
)


def test_freq_encode_layout_and_dim():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    enc = freq_encode(x, num_freqs=4)
    assert enc.shape == (1, freq_encode_dim(3, 4))
    e = np.asarray(enc)[0]
    np.testing.assert_allclose(e[:3], [0.5, -0.25, 1.0], atol=1e-6)
    # first band: sin(x), cos(x)
    np.testing.assert_allclose(e[3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(e[6:9], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
    # second band: sin(2x)
    np.testing.assert_allclose(e[9:12], np.sin([1.0, -0.5, 2.0]), atol=1e-6)


def test_sh_encode_degree1_and_known_values():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    e = np.asarray(sh_encode(d, degree=4))[0]
    assert e.shape == (16,)
    np.testing.assert_allclose(e[0], 0.28209479, atol=1e-6)
    np.testing.assert_allclose(e[1], 0.0, atol=1e-7)         # -c1*y
    np.testing.assert_allclose(e[2], 0.48860252, atol=1e-6)  # c1*z
    np.testing.assert_allclose(e[3], 0.0, atol=1e-7)         # -c1*x
    # l=2, m=0 term at z=1: 0.31539157*(2z² - x² - y²) = 0.63078313
    np.testing.assert_allclose(e[6], 0.63078313, atol=1e-5)


def test_nerf_mlp_shapes(key):
    model = NeRFMLP(depth=4, width=64, skips=(2,), multires=6, multires_views=3)
    pts = jax.random.normal(key, (10, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (10, 3))
    params = model.init(key, pts, dirs)["params"]
    out = model.apply({"params": params}, pts, dirs)
    assert out.shape == (10, 4)
    assert np.isfinite(np.asarray(out)).all()
    # σ must not depend on viewdirs (geometry/appearance factorization).
    out2 = model.apply({"params": params}, pts, -dirs)
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(out2[..., 3]),
                               atol=1e-5)


def test_hash_encode_interpolation_is_trilinear():
    # One level, dense (res+1)^3 <= T so indexing is exact; feature at a point
    # must be the trilinear blend of its 8 corner features.
    rng = np.random.default_rng(0)
    T, F, res = 512, 2, 4  # (4+1)^3 = 125 <= 512 → dense indexing
    table = rng.normal(size=(1, T, F)).astype(np.float32)
    x = np.array([[0.3, 0.55, 0.7]], np.float32)
    got = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(table),
                                 base_res=res, per_level_scale=2.0))
    pos = x[0] * res
    p0 = np.floor(pos).astype(int)
    frac = pos - p0
    want = np.zeros(F, np.float32)
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                idx = (p0[0] + i) + (p0[1] + j) * (res + 1) + (p0[2] + k) * (res + 1) ** 2
                w = ((frac[0] if i else 1 - frac[0])
                     * (frac[1] if j else 1 - frac[1])
                     * (frac[2] if k else 1 - frac[2]))
                want += w * table[0, idx]
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_hash_encode_exact_at_grid_points():
    rng = np.random.default_rng(1)
    T, F, res = 512, 2, 4
    table = rng.normal(size=(1, T, F)).astype(np.float32)
    # point exactly on grid node (2, 1, 3) of the res-4 grid
    x = np.array([[2 / 4, 1 / 4, 3 / 4]], np.float32)
    got = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(table),
                                 base_res=res, per_level_scale=2.0))[0]
    idx = 2 + 1 * 5 + 3 * 25
    np.testing.assert_allclose(got, table[0, idx], atol=1e-5)


def test_hashgrid_field_forward(key):
    model = HashGridField(bound=2.0, n_levels=4, log2_hashmap_size=10,
                          finest_res_per_unit=64)
    pts = jax.random.uniform(key, (32, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (32, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = model.init(key, pts, dirs)["params"]
    out = model.apply({"params": params}, pts, dirs)
    assert out.shape == (32, 4)
    assert np.isfinite(np.asarray(out)).all()
    # σ independent of direction here too.
    out2 = model.apply({"params": params}, pts, -dirs)
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(out2[..., 3]),
                               atol=1e-5)


def test_frozen_sigma_field_nerf_rgb_parity(key):
    """NeRF_RGB parity (reference run_nerf_helpers.py:161-218): σ comes from
    the frozen alpha model, rgb from the trainable model, and no gradient
    reaches the alpha params."""
    from gbnerf_tpu.core import make_field_fn, make_frozen_sigma_field_fn

    model = NeRFMLP(depth=2, width=32, skips=(1,), multires=4, multires_views=2)
    pts = jax.random.normal(key, (6, 5, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (6, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    p_rgb = model.init(key, pts, dirs[:, None]) ["params"]
    p_alpha = model.init(jax.random.fold_in(key, 2), pts, dirs[:, None])["params"]

    def build(p_r, p_a):
        return make_frozen_sigma_field_fn(
            make_field_fn(model, p_r), make_field_fn(model, p_a))

    raw = build(p_rgb, p_alpha)(pts, dirs)
    raw_rgb = make_field_fn(model, p_rgb)(pts, dirs)
    raw_alpha = make_field_fn(model, p_alpha)(pts, dirs)
    np.testing.assert_allclose(np.asarray(raw[..., :3]),
                               np.asarray(raw_rgb[..., :3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(raw[..., 3]),
                               np.asarray(raw_alpha[..., 3]), atol=1e-6)
    # sigma_only routes straight to the alpha model
    raw_s = build(p_rgb, p_alpha)(pts, dirs, sigma_only=True)
    np.testing.assert_allclose(np.asarray(raw_s[..., 3]),
                               np.asarray(raw_alpha[..., 3]), atol=1e-6)

    # gradients: flow to rgb params, identically zero to alpha params
    g_rgb, g_alpha = jax.grad(
        lambda pr, pa: jnp.sum(build(pr, pa)(pts, dirs)), argnums=(0, 1)
    )(p_rgb, p_alpha)
    assert max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(g_alpha)) == 0.0
    assert max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(g_rgb)) > 0.0
