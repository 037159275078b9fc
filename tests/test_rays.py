import numpy as np
import jax.numpy as jnp

from gbnerf_tpu.core import get_rays, get_rays_by_coord, ndc_rays


def random_pose(rng):
    # Random rotation via QR, plus translation.
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    c2w = np.concatenate([q, rng.normal(size=(3, 1))], axis=1).astype(np.float32)
    return c2w


def oracle_rays(H, W, focal, c2w):
    """Straightforward per-pixel loop oracle for the pinhole ray model."""
    rays_o = np.empty((H, W, 3), np.float32)
    rays_d = np.empty((H, W, 3), np.float32)
    for y in range(H):
        for x in range(W):
            d = np.array([(x - W * 0.5) / focal, -(y - H * 0.5) / focal, -1.0])
            rays_d[y, x] = c2w[:3, :3] @ d
            rays_o[y, x] = c2w[:3, -1]
    return rays_o, rays_d


def test_get_rays_matches_oracle(rng):
    H, W, focal = 7, 11, 23.0
    c2w = random_pose(rng)
    ro, rd = get_rays(H, W, focal, jnp.asarray(c2w))
    oro, ord_ = oracle_rays(H, W, focal, c2w)
    np.testing.assert_allclose(np.asarray(ro), oro, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), ord_, atol=1e-5)


def test_rays_by_coord_consistent_with_grid(rng):
    H, W, focal = 9, 13, 31.0
    c2w = random_pose(rng)
    ro_g, rd_g = get_rays(H, W, focal, jnp.asarray(c2w))
    coords = np.array([[0.0, 0.0], [5.0, 3.0], [12.0, 8.0]], np.float32)  # (x, y)
    ro, rd = get_rays_by_coord(H, W, focal, jnp.asarray(c2w), jnp.asarray(coords))
    for n, (x, y) in enumerate(coords.astype(int)):
        np.testing.assert_allclose(np.asarray(rd[n]), np.asarray(rd_g[y, x]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ro[n]), np.asarray(ro_g[y, x]), atol=1e-5)


def test_ndc_rays_near_plane():
    # After NDC mapping, origins must lie on the z = -near plane mapped to
    # o2 = 1 + 2·near/oz; a centered ray maps to the NDC origin axis.
    H = W = 100
    focal = 50.0
    near = 1.0
    rays_o = jnp.asarray([[0.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[0.0, 0.0, -1.0]])
    o, d = ndc_rays(H, W, focal, near, rays_o, rays_d)
    np.testing.assert_allclose(np.asarray(o[0]), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0]), [0.0, 0.0, 2.0], atol=1e-6)
