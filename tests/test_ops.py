import numpy as np
import jax
import jax.numpy as jnp

from gbnerf_tpu.core.sampling import sample_pdf, merge_z_vals
from gbnerf_tpu.ops import sample_pdf_onehot, merge_sorted_onehot


def test_sample_pdf_onehot_matches_oracle_det(rng):
    bins = np.sort(rng.random((16, 63)).astype(np.float32) * 5, axis=-1)
    weights = rng.random((16, 62)).astype(np.float32)
    fast = np.asarray(sample_pdf_onehot(jnp.asarray(bins), jnp.asarray(weights),
                                        64, det=True))
    oracle = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights),
                                   64, det=True))
    # u = 1.0 (last det sample): when f32 cumsum overshoots 1.0, the
    # reference-quirk oracle lands on bins[-2] while the clamp-sum form gives
    # the true inverse bins[-1] (divergence documented in ops/resample.py).
    np.testing.assert_allclose(fast[:, :-1], oracle[:, :-1], atol=2e-4)
    assert (fast[:, -1] >= bins[:, -2] - 1e-6).all()
    assert (fast[:, -1] <= bins[:, -1] + 1e-6).all()


def test_sample_pdf_onehot_matches_oracle_stochastic(rng, key):
    bins = np.sort(rng.random((8, 33)).astype(np.float32) * 3, axis=-1)
    weights = rng.random((8, 32)).astype(np.float32)
    fast = np.asarray(sample_pdf_onehot(jnp.asarray(bins), jnp.asarray(weights),
                                        32, det=False, rng=key))
    oracle = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights),
                                   32, det=False, rng=key))
    np.testing.assert_allclose(fast, oracle, atol=2e-4)


def test_sample_pdf_onehot_concentrated_weights(key):
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(4, 0)
    weights = jnp.zeros((4, 10)).at[:, 7].set(1.0)
    s = np.asarray(sample_pdf_onehot(bins, weights, 16, det=False, rng=key))
    assert (s >= 0.7 - 1e-3).all() and (s <= 0.8 + 1e-3).all()


def test_merge_sorted_onehot_matches_sort(rng):
    a = np.sort(rng.random((32, 64)).astype(np.float32) * 5, -1)
    b = np.sort(rng.random((32, 48)).astype(np.float32) * 5, -1)
    fast = np.asarray(merge_sorted_onehot(jnp.asarray(a), jnp.asarray(b)))
    oracle = np.sort(np.concatenate([a, b], -1), -1)
    np.testing.assert_allclose(fast, oracle, atol=1e-6)


def test_merge_sorted_onehot_with_duplicates():
    a = jnp.asarray([[1.0, 2.0, 2.0, 3.0]])
    b = jnp.asarray([[2.0, 2.5]])
    fast = np.asarray(merge_sorted_onehot(a, b))
    np.testing.assert_allclose(fast[0], [1.0, 2.0, 2.0, 2.0, 2.5, 3.0])


def test_merge_gradients_flow(key):
    # z_samples gradients must pass through the merge (coarse z is stop-grad
    # in the render path, but the op itself should be differentiable).
    a = jnp.sort(jax.random.uniform(key, (4, 8)), -1)
    b = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1), (4, 6)), -1)
    g = jax.grad(lambda b: jnp.sum(merge_sorted_onehot(a, b) ** 2))(b)
    assert float(jnp.abs(g).max()) > 0


def test_cumsum_mm_matches_jnp_cumsum():
    """ops/scan.py triangular-matmul cumsum ≡ jnp.cumsum (both orders)."""
    import jax
    import jax.numpy as jnp
    from gbnerf_tpu.ops.scan import _cumsum_mm, cumsum_last

    x = jax.random.uniform(jax.random.PRNGKey(3), (37, 128))
    np.testing.assert_allclose(np.asarray(_cumsum_mm(x)),
                               np.asarray(jnp.cumsum(x, axis=-1)),
                               rtol=1e-5, atol=1e-5)
    excl = _cumsum_mm(x, exclusive=True)
    ref = jnp.concatenate([jnp.zeros_like(x[..., :1]),
                           jnp.cumsum(x, axis=-1)[..., :-1]], axis=-1)
    np.testing.assert_allclose(np.asarray(excl), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # batched leading dims
    xb = x.reshape(37, 1, 128)
    np.testing.assert_allclose(np.asarray(_cumsum_mm(xb)),
                               np.asarray(jnp.cumsum(xb, axis=-1)),
                               rtol=1e-5, atol=1e-5)
    # public entry on CPU = exact jnp path
    np.testing.assert_allclose(np.asarray(cumsum_last(x)),
                               np.asarray(jnp.cumsum(x, axis=-1)), atol=0)


def test_cumprod_exclusive_logspace_matches_cumprod():
    """exp∘cumsum∘log transmittance form ≡ exclusive cumprod with the
    reference's per-factor ε (raw2outputs parity, run_nerf_helpers.py:375)."""
    import jax
    import jax.numpy as jnp
    from gbnerf_tpu.ops.scan import _cumsum_mm

    alpha = jax.random.uniform(jax.random.PRNGKey(4), (19, 64))
    alpha = alpha.at[:, 5].set(1.0)  # opaque sample → factor floor 1e-10
    x = 1.0 - alpha
    ref = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(x[..., :1]), x[..., :-1] + 1e-10], -1), axis=-1)
    got = jnp.exp(_cumsum_mm(jnp.log(x + 1e-10), exclusive=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=1e-6)


def test_merge_countsort_matches_sort_merge(rng):
    """The gather-free rank-scatter variant stays exact vs the sort path."""
    from gbnerf_tpu.ops.resample import merge_sorted_countsort, merge_sorted_fast

    a = np.sort(rng.random((7, 9)).astype(np.float32), axis=-1)
    b = np.sort(rng.random((7, 5)).astype(np.float32), axis=-1)
    np.testing.assert_array_equal(
        np.asarray(merge_sorted_countsort(jnp.asarray(a), jnp.asarray(b))),
        np.asarray(merge_sorted_fast(jnp.asarray(a), jnp.asarray(b))))


def test_cumprod_logspace_tpu_form_is_inf_free_at_alpha_one():
    """Regression (verify-caught): the TPU log-space transmittance must use
    max(x, ε) — an additive (1-α)+ε gets reassociated by XLA into
    (1+ε)-α == 1-α in f32, so opaque samples produce log(0) = -inf and the
    triangular matmul turns -inf·0 into row-wide NaN."""
    import jax.numpy as jnp
    from gbnerf_tpu.ops.scan import _cumsum_mm

    alpha = jnp.zeros((4, 16)).at[:, 3].set(1.0).at[:, 9].set(1.0)
    x = 1.0 - alpha
    # exact expression of the TPU branch in cumprod_last_exclusive
    lg = jnp.log(jnp.maximum(x, 1e-10))
    assert np.isfinite(np.asarray(lg)).all()
    got = jnp.exp(_cumsum_mm(lg, exclusive=True))
    ref = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(x[..., :1]), x[..., :-1] + 1e-10], -1), axis=-1)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=1e-9)


def test_bitonic_merge128_matches_sort(rng):
    """Pallas bitonic-merge kernel (interpret mode on CPU) == sorted concat
    for the production 64+64 split and an uneven 48+80 split."""
    from gbnerf_tpu.ops.resample import _merge128

    for A, B in ((64, 64), (48, 80)):
        a = np.sort(rng.random((37, A)).astype(np.float32), axis=-1)
        b = np.sort(rng.random((37, B)).astype(np.float32), axis=-1)
        got = np.asarray(_merge128(jnp.asarray(a), jnp.asarray(b)))
        ref = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        np.testing.assert_array_equal(got, ref)


def test_bitonic_merge128_with_ties(rng):
    """Duplicate values across the two halves must still merge exactly."""
    from gbnerf_tpu.ops.resample import _merge128

    vals = rng.integers(0, 10, size=(21, 128)).astype(np.float32)
    a = np.sort(vals[:, :64], axis=-1)
    b = np.sort(vals[:, 64:], axis=-1)
    got = np.asarray(_merge128(jnp.asarray(a), jnp.asarray(b)))
    ref = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_array_equal(got, ref)
