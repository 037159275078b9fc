import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gbnerf_tpu.core.cp_field import CPGridField, cp_encode, twohot_interp


def test_twohot_interp_matches_numpy_lerp(rng):
    R, rank, N = 32, 4, 100
    line = rng.normal(size=(R, rank)).astype(np.float32)
    x = rng.random(N).astype(np.float32)
    got = np.asarray(twohot_interp(jnp.asarray(x), jnp.asarray(line),
                                   compute_dtype=jnp.float32))
    u = x * (R - 1)
    i0 = np.floor(u).astype(int)
    f = (u - i0)[:, None]
    want = line[i0] * (1 - f) + line[np.minimum(i0 + 1, R - 1)] * f
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_twohot_interp_exact_at_nodes(rng):
    R, rank = 16, 3
    line = rng.normal(size=(R, rank)).astype(np.float32)
    x = jnp.asarray(np.arange(R) / (R - 1), jnp.float32)
    got = np.asarray(twohot_interp(x, jnp.asarray(line),
                                   compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, line, atol=1e-5)


def test_cp_encode_is_product_of_axes(rng):
    lines = [jnp.asarray(rng.normal(size=(3, 8, 2)).astype(np.float32))]
    x = jnp.asarray([[0.0, 0.0, 0.0]])
    got = np.asarray(cp_encode(x, lines, compute_dtype=jnp.float32))[0]
    want = (np.asarray(lines[0][0, 0]) * np.asarray(lines[0][1, 0])
            * np.asarray(lines[0][2, 0]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cp_field_forward_and_grad(key):
    model = CPGridField(bound=2.0, resolutions=(8, 16), rank=4,
                        compute_dtype=jnp.float32)
    pts = jax.random.uniform(key, (64, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = model.init(key, pts, dirs)["params"]
    out = model.apply({"params": params}, pts, dirs)
    assert out.shape == (64, 4)
    assert np.isfinite(np.asarray(out)).all()

    g = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, pts, dirs) ** 2))(params)
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
    assert gmax > 0

    # σ independent of viewdir
    out2 = model.apply({"params": params}, pts, -dirs)
    np.testing.assert_allclose(np.asarray(out[..., 3]),
                               np.asarray(out2[..., 3]), atol=1e-5)


@pytest.mark.slow
def test_cp_field_can_overfit_a_density(key):
    # The field must be able to fit a simple spatial function quickly.
    model = CPGridField(bound=1.0, resolutions=(8, 16, 32), rank=8,
                        compute_dtype=jnp.float32)
    pts = jax.random.uniform(key, (2048, 3), minval=-1.0, maxval=1.0)
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), pts.shape)
    target = jnp.sin(3 * pts[:, 0]) * jnp.cos(2 * pts[:, 1]) + pts[:, 2]
    params = model.init(key, pts, dirs)["params"]

    import optax

    tx = optax.adam(2e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, pts, dirs)
            return jnp.mean((out[:, 3] - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return jax.tree_util.tree_map(lambda a, b: a + b, params, up), opt, loss

    for i in range(200):
        params, opt, loss = step(params, opt)
    first = float(jnp.mean((model.apply({"params": model.init(key, pts, dirs)["params"]}, pts, dirs)[:, 3] - target) ** 2))
    assert float(loss) < first * 0.1, (first, float(loss))


@pytest.mark.slow
def test_proposal_coarse_field_config():
    """cp_resolutions_coarse builds a smaller coarse field; render runs."""
    import jax
    import jax.numpy as jnp
    import dataclasses
    from gbnerf_tpu.config import Config, FieldConfig, RenderConfig
    from gbnerf_tpu.train.state import create_train_state
    from gbnerf_tpu.train.step import make_render_fn

    cfg = Config(
        field=FieldConfig(no_tcnn=False, field_type="cp",
                          cp_resolutions=(17, 33, 65), cp_rank=8,
                          cp_resolutions_coarse=(17, 33), cp_rank_coarse=4),
        render=RenderConfig(N_samples=8, N_importance=8))
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    # coarse grid params strictly smaller than fine
    csize = sum(x.size for x in jax.tree_util.tree_leaves(state.params["coarse"]))
    fsize = sum(x.size for x in jax.tree_util.tree_leaves(state.params["fine"]))
    assert csize < fsize
    render = make_render_fn(cfg, coarse, fine, near=1.0, far=4.0)
    k = jax.random.PRNGKey(1)
    ro = jax.random.normal(k, (16, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(k, 1), (16, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    out = render(state.params, ro, rd, jax.random.PRNGKey(2), train=True)
    assert np.isfinite(np.asarray(out.rgb)).all()
