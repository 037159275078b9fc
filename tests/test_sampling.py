import numpy as np
import jax
import jax.numpy as jnp

from gbnerf_tpu.core import (
    sample_pdf, searchsorted_right, stratified_z_vals, merge_z_vals,
)


def test_searchsorted_right_matches_numpy(rng):
    for _ in range(20):
        a = np.sort(rng.random((5, 17)).astype(np.float32), axis=-1)
        v = rng.random((5, 9)).astype(np.float32)
        got = np.asarray(searchsorted_right(jnp.asarray(a), jnp.asarray(v)))
        want = np.stack([np.searchsorted(a[i], v[i], side="right") for i in range(5)])
        np.testing.assert_array_equal(got, want)


def test_sample_pdf_det_inverts_cdf(rng):
    # Property-based oracle: each returned sample s for query u must satisfy
    # F(s) ≈ u, where F is the piecewise-linear CDF over the bins. (A direct
    # index-by-index comparison against np.searchsorted is brittle: float32
    # cumsum tie-flips at CDF boundaries legally move a sample to the
    # adjacent interval.)
    bins = np.sort(rng.random((8, 63)).astype(np.float32) * 5, axis=-1)
    weights = rng.random((8, 62)).astype(np.float32)
    n = 64
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n, det=True))
    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    u = np.linspace(0, 1, n, dtype=np.float32)
    for r in range(len(bins)):
        fu = np.interp(got[r], bins[r], cdf[r])
        np.testing.assert_allclose(fu, np.minimum(u, cdf[r, -1]), atol=2e-4)
        assert (np.diff(got[r]) >= -1e-5).all()  # monotone in u


def test_sample_pdf_concentrates_mass(key):
    # All weight in one interval → all samples land in that interval.
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(4, 0)
    weights = jnp.zeros((4, 10)).at[:, 3].set(1.0)
    s = sample_pdf(bins, weights, 32, det=False, rng=key)
    s = np.asarray(s)
    assert (s >= 0.3 - 1e-3).all() and (s <= 0.4 + 1e-3).all()


def test_sample_pdf_stochastic_in_range(key):
    bins = jnp.sort(jax.random.uniform(key, (3, 20)) * 7, axis=-1)
    weights = jax.random.uniform(jax.random.fold_in(key, 1), (3, 19))
    s = np.asarray(sample_pdf(bins, weights, 50, det=False, rng=key))
    b = np.asarray(bins)
    assert (s >= b[:, :1] - 1e-5).all() and (s <= b[:, -1:] + 1e-5).all()


def test_stratified_z_vals_linear_and_lindisp():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = np.asarray(stratified_z_vals(near, far, 5))
    np.testing.assert_allclose(z[0], [2, 3, 4, 5, 6], atol=1e-6)
    zl = np.asarray(stratified_z_vals(near, far, 3, lindisp=True))
    # disparity-linear: 1/z linear between 1/2 and 1/6
    np.testing.assert_allclose(1 / zl[0], [0.5, (0.5 + 1 / 6) / 2, 1 / 6], atol=1e-6)


def test_stratified_perturb_within_intervals(key):
    near, far = jnp.zeros((2, 1)), jnp.ones((2, 1))
    z = np.asarray(stratified_z_vals(near, far, 16, perturb=True, rng=key))
    assert (np.diff(z, axis=-1) > -1e-6).all()
    assert (z >= 0).all() and (z <= 1).all()


def test_merge_z_vals_sorted(key):
    a = jnp.sort(jax.random.uniform(key, (3, 8)), -1)
    b = jax.random.uniform(jax.random.fold_in(key, 1), (3, 4))
    m = np.asarray(merge_z_vals(a, b))
    assert m.shape == (3, 12)
    assert (np.diff(m, axis=-1) >= 0).all()
