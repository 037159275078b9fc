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
