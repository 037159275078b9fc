import numpy as np
import jax.numpy as jnp

from gbnerf_tpu.train.eval import convert_pose, render_path_projection
from gbnerf_tpu.utils.warp import bilinear_sample, reproject


def test_reproject_identity():
    # Same camera → every pixel maps to itself, same depth.
    H, W, f = 8, 10, 12.0
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    c2w = jnp.eye(3, 4)
    depth = jnp.full((H, W), 3.0)
    coords, depth_b, valid = reproject(depth, K, c2w, c2w)
    jj, ii = np.mgrid[0:H, 0:W]
    np.testing.assert_allclose(np.asarray(coords[..., 0]), ii, atol=1e-4)
    np.testing.assert_allclose(np.asarray(coords[..., 1]), jj, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth_b), 3.0, atol=1e-5)
    assert bool(np.asarray(valid).all())


def test_reproject_translated_camera():
    # Camera B shifted right by t: a point at depth d shifts u by -f·t/d.
    H, W, f = 16, 16, 20.0
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    A = jnp.eye(3, 4)
    B = jnp.eye(3, 4).at[0, 3].set(0.5)
    depth = jnp.full((H, W), 2.0)
    coords, depth_b, valid = reproject(depth, K, A, B)
    jj, ii = np.mgrid[0:H, 0:W]
    np.testing.assert_allclose(np.asarray(coords[..., 0]),
                               ii - f * 0.5 / 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth_b), 2.0, atol=1e-5)


def test_bilinear_sample_exact_on_grid(rng):
    img = jnp.asarray(rng.random((6, 7, 3)).astype(np.float32))
    coords = jnp.asarray([[2.0, 3.0], [0.0, 0.0]])
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img[3, 2]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(img[0, 0]),
                               atol=1e-6)


def test_convert_pose_flips_yz():
    p = np.eye(4)
    q = convert_pose(p)
    np.testing.assert_allclose(np.diag(q), [1, -1, -1, 1])
