import os

import numpy as np
import jax
import jax.numpy as jnp

from gbnerf_tpu.core.normals import field_normals, pointcloud_normals
from gbnerf_tpu.data.colmap import read_dense_array, write_dense_array
from gbnerf_tpu.guidance.directional import (adjust_text_embeddings,
                                             get_pos_neg_text_embeddings)
from gbnerf_tpu.train.losses import (compute_scale_and_shift, gradient_loss,
                                     pwclip, sigma_loss)
from gbnerf_tpu.utils.gallery import draw_keypoints, generate_html_gallery


def test_pwclip_identity_forward_clipped_backward(key):
    x = jax.random.normal(key, (8, 3)) * 5
    np.testing.assert_allclose(np.asarray(pwclip(x)), np.asarray(x))
    # a loss with huge gradients → clipped to ≤1 per channel, row-min scaled
    g = jax.grad(lambda x: jnp.sum(100.0 * pwclip(x)))(x)
    assert float(jnp.abs(g).max()) <= 1.0 + 1e-6


def test_dense_array_roundtrip(tmp_path, rng):
    arr = rng.random((7, 5)).astype(np.float32)
    p = str(tmp_path / "depth.bin")
    write_dense_array(arr, p)
    back = read_dense_array(p)
    np.testing.assert_allclose(back, arr)
    arr3 = rng.random((4, 6, 3)).astype(np.float32)
    write_dense_array(arr3, p)
    np.testing.assert_allclose(read_dense_array(p), arr3)


def test_pointcloud_normals_on_plane(rng):
    pts = np.concatenate(
        [rng.random((200, 2)), np.zeros((200, 1))], axis=1)
    n = pointcloud_normals(pts, knn=10)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-5)


def test_field_normals_on_linear_density():
    # σ(x) = x₂ → ∇σ = ez → n = −ez
    n = field_normals(lambda p: p[2], jnp.asarray([[0.3, 0.4, 0.5]]))
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-6)


def test_directional_embeddings(key):
    L, D = 7, 8
    emb = {k: jax.random.normal(jax.random.fold_in(key, i), (L, D))
           for i, k in enumerate(("front", "side", "back"))}
    z, w = get_pos_neg_text_embeddings(emb, 0.0)
    assert z.shape == (3, L, D) and w.shape == (3,)
    np.testing.assert_allclose(np.asarray(z[0]), np.asarray(emb["front"]),
                               atol=1e-6)  # azimuth 0 → pure front
    zb, wb = get_pos_neg_text_embeddings(emb, 180.0)
    np.testing.assert_allclose(np.asarray(zb[0]), np.asarray(emb["back"]),
                               atol=1e-5)
    zs, ws = adjust_text_embeddings(emb, jnp.asarray([0.0, 90.0]))
    assert zs.shape == (6, L, D) and ws.shape == (4,)


def test_scale_shift_and_gradient_loss(rng):
    target = rng.random((1, 8, 8)).astype(np.float32)
    pred = (target - 0.5) / 2.0    # scale 2, shift 1 recovers target
    mask = np.ones_like(target)
    s, t = compute_scale_and_shift(jnp.asarray(pred), jnp.asarray(target),
                                   jnp.asarray(mask))
    np.testing.assert_allclose(float(s[0]), 2.0, atol=1e-4)
    np.testing.assert_allclose(float(t[0]), 0.5, atol=1e-4)
    g = gradient_loss(jnp.asarray(pred), jnp.asarray(target),
                      jnp.asarray(mask))
    assert np.isfinite(float(g[0]))


def test_sigma_loss_prefers_terminal_density(key):
    # field with huge σ at the supervised depth → loss near −e^σ/(Σ+1) low
    def field_fn(pts, viewdirs):
        d = jnp.linalg.norm(pts, axis=-1)
        sigma = jnp.where(jnp.abs(d - 2.0) < 0.1, 10.0, 0.0)
        return jnp.concatenate([jnp.zeros(pts.shape[:-1] + (3,)),
                                sigma[..., None]], -1)

    ro = jnp.zeros((4, 3))
    rd = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
    l_match = sigma_loss(field_fn, ro, rd, rd, 0.5, jnp.full((4,), 2.0),
                         N_samples=32, perturb=False)
    l_miss = sigma_loss(field_fn, ro, rd, rd, 0.5, jnp.full((4,), 3.5),
                        N_samples=32, perturb=False)
    # supervision at the density band must score (much) better than off-band
    assert float(l_match.mean()) < float(l_miss.mean()) - 0.1


def test_html_gallery_and_keypoints(tmp_path, rng):
    import imageio.v2 as imageio

    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.png")
    imageio.imwrite(p, img)
    out = generate_html_gallery(str(tmp_path), {"renders": [p]})
    assert os.path.exists(out)
    assert "renders" in open(out).read()

    over = draw_keypoints(img, [(3, 4), (10, 12)])
    assert tuple(over[4, 3]) == (255, 0, 0)


def test_cp_tv_loss(key):
    from gbnerf_tpu.train.losses import cp_tv_loss
    import jax

    smooth = {"coarse": {"lines_0": jnp.ones((3, 8, 4))}}
    noisy = {"coarse": {"lines_0": jax.random.normal(key, (3, 8, 4))}}
    assert float(cp_tv_loss(noisy)) > float(cp_tv_loss(smooth))
    # no lines → zero
    assert float(cp_tv_loss({"mlp": {"kernel": jnp.ones((4, 4))}})) == 0.0


def test_dump_eval_images_reports_psnr_and_lpips(tmp_path, rng):
    """dump_eval_images returns a metrics dict; lpips only when a metric fn
    is supplied (paper metrics are PSNR + LPIPS, SURVEY.md §6); masked /
    unmasked PSNR only when test masks are supplied."""
    from gbnerf_tpu.train.eval import dump_eval_images

    maps = {"rgb": rng.random((2, 8, 12, 3)).astype(np.float32),
            "disp": rng.random((2, 8, 12)).astype(np.float32)}
    gt = rng.random((2, 8, 12, 3)).astype(np.float32)

    m1 = dump_eval_images(maps, str(tmp_path / "e1"), gt=gt)
    assert m1["psnr"] is not None and m1["lpips"] is None
    assert m1["psnr_masked"] is None

    def fake_lpips(a, b):
        return jnp.mean((a - b) ** 2, axis=(1, 2, 3))

    m2 = dump_eval_images(maps, str(tmp_path / "e2"), gt=gt,
                          lpips_fn=fake_lpips)
    assert abs(m2["psnr"] - m1["psnr"]) < 1e-6
    assert m2["lpips"] is not None and m2["lpips"] > 0

    m3 = dump_eval_images(maps, str(tmp_path / "e3"))
    assert m3["psnr"] is None and m3["lpips"] is None

    # Masked metrics: perfect inside the mask, noisy outside → masked PSNR
    # far above unmasked.
    masks = np.zeros((2, 8, 12), np.float32)
    masks[:, 2:5, 3:8] = 1.0
    gt4 = maps["rgb"].copy()
    out = masks[..., None] < 0.5
    gt4[np.broadcast_to(out, gt4.shape)] = rng.random(int(out.sum() * 3))
    m4 = dump_eval_images(maps, str(tmp_path / "e4"), gt=gt4, gt_masks=masks)
    assert m4["psnr_masked"] is not None and m4["psnr_unmasked"] is not None
    assert m4["psnr_masked"] > m4["psnr_unmasked"] + 20
