import os

import numpy as np
import jax.numpy as jnp

from gbnerf_tpu.data.colmap import (Camera, Image, Point3D, rotmat2qvec,
                                    write_cameras_binary, write_images_binary,
                                    write_points3d_binary)
from gbnerf_tpu.data.llff import load_poses_bounds
from gbnerf_tpu.data.pose_utils import colmap_to_poses_bounds
from gbnerf_tpu.utils.profiling import StepTimer, nan_guard


def make_synthetic_colmap(tmp_path, rng, n_img=4, aim=False):
    """aim=True points every camera down +z at the point cluster (z≈4), so
    sparse-depth projections land inside the scene bounds."""
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse, exist_ok=True)
    cams = {1: Camera(1, "PINHOLE", 640, 480,
                      np.array([500.0, 500.0, 320.0, 240.0]))}
    write_cameras_binary(cams, str(sparse / "cameras.bin"))

    pts = {}
    for i in range(1, 40):
        pts[i] = Point3D(i, rng.normal(size=3) + np.array([0, 0, 4.0]),
                         np.zeros(3, np.uint8), float(rng.random()),
                         np.array([1], np.int32), np.array([0], np.int32))
    write_points3d_binary(pts, str(sparse / "points3D.bin"))

    images, c2ws = {}, []
    for k in range(n_img):
        if aim:
            q = np.eye(3)
            t = rng.normal(size=3) * 0.1
        else:
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            t = rng.normal(size=3)
        w2c = np.eye(4)
        w2c[:3, :3], w2c[:3, 3] = q, t
        c2w = np.linalg.inv(w2c)
        c2ws.append(c2w[:3, :4])
        pids = np.array(sorted(rng.choice(np.arange(1, 40), 10,
                                          replace=False)), np.int64)
        images[k + 1] = Image(k + 1, rotmat2qvec(q), t, 1,
                              f"img_{k:03d}.png",
                              rng.random((10, 2)) * 100, pids)
    write_images_binary(images, str(sparse / "images.bin"))
    return np.stack(c2ws)


def test_colmap_to_poses_bounds_roundtrip(tmp_path, rng):
    c2ws = make_synthetic_colmap(tmp_path, rng)
    arr = colmap_to_poses_bounds(str(tmp_path))
    assert arr.shape == (4, 17)
    np.save(tmp_path / "poses_bounds.npy", arr)

    poses, bds = load_poses_bounds(str(tmp_path))
    # After the loader's [-u, r, -t] → [r, u, -t] fix, translation and the
    # camera axes must match the original COLMAP c2w up to the OpenGL flip
    # (x right, y up, z backward vs COLMAP x right, y down, z forward).
    for k in range(4):
        np.testing.assert_allclose(poses[k, :3, 3], c2ws[k][:, 3], atol=1e-5)
        np.testing.assert_allclose(poses[k, :3, 0], c2ws[k][:, 0], atol=1e-5)
        np.testing.assert_allclose(poses[k, :3, 1], -c2ws[k][:, 1], atol=1e-5)
        np.testing.assert_allclose(poses[k, :3, 2], -c2ws[k][:, 2], atol=1e-5)
    assert (bds[:, 0] < bds[:, 1]).all()
    # hwf column
    np.testing.assert_allclose(poses[0, :, 4], [480, 640, 500], atol=1e-5)


def test_nan_guard():
    good = {"a": jnp.ones((4,)), "b": {"c": jnp.zeros((2, 2))}}
    bad = {"a": jnp.ones((4,)).at[1].set(jnp.nan), "b": good["b"]}
    assert not bool(nan_guard(good))
    assert bool(nan_guard(bad))


def test_step_timer_skips_compile_interval():
    t = StepTimer()
    t.tick(10)      # "compile" interval — excluded
    import time

    time.sleep(0.01)
    t.tick(10)
    assert t.steps == 10
    assert t.steady_rate > 0


def test_colmap_and_sensor_depth_loaders(tmp_path, rng):
    """Projection/weighting parity for the sparse-depth loaders
    (reference load_llff.py:467-518 and the :521-578 sensor variant)."""
    from gbnerf_tpu.data.llff import load_colmap_depth, load_sensor_depth

    make_synthetic_colmap(tmp_path, rng, aim=True)
    np.save(tmp_path / "poses_bounds.npy", colmap_to_poses_bounds(str(tmp_path)))

    depth1 = load_colmap_depth(str(tmp_path), factor=4, skip_first=1)
    assert 0 < len(depth1) <= 3          # 4 images − 1 test split
    for d in depth1:
        assert d["depth"].shape == d["weight"].shape
        assert d["coord"].shape == (len(d["depth"]), 2)
        assert (d["weight"] > 0).all() and (d["weight"] <= 2.0).all()

    depth2 = load_sensor_depth(str(tmp_path), factor=4)
    assert len(depth2) >= len(depth1)    # no test-split offset → ≥ coverage
    assert (tmp_path / "colmap_depth.npy").exists()


def test_colmap_text_model_roundtrip(tmp_path, rng):
    """write_model('.txt') → read_model restores cameras/images/points3D
    exactly (reference read_write_model.py write_*_text parity; the text
    fallback previously dropped points3D)."""
    from gbnerf_tpu.data.colmap import read_model, write_model

    make_synthetic_colmap(tmp_path, rng)
    sparse = str(tmp_path / "sparse" / "0")
    cams, images, points = read_model(sparse)
    assert points                        # binary read has the points

    txt_dir = str(tmp_path / "sparse_txt")
    write_model(cams, images, points, txt_dir, ext=".txt")
    for f in ("cameras.txt", "images.txt", "points3D.txt"):
        assert os.path.exists(os.path.join(txt_dir, f))

    cams2, images2, points2 = read_model(txt_dir)
    assert cams2.keys() == cams.keys()
    for cid in cams:
        a, b = cams[cid], cams2[cid]
        assert (a.model, a.width, a.height) == (b.model, b.width, b.height)
        np.testing.assert_allclose(a.params, b.params)
    assert images2.keys() == images.keys()
    for iid in images:
        a, b = images[iid], images2[iid]
        assert (a.name, a.camera_id) == (b.name, b.camera_id)
        np.testing.assert_allclose(a.qvec, b.qvec)
        np.testing.assert_allclose(a.tvec, b.tvec)
        np.testing.assert_allclose(a.xys, b.xys)
        np.testing.assert_array_equal(a.point3D_ids, b.point3D_ids)
    assert points2.keys() == points.keys()
    for pid in points:
        a, b = points[pid], points2[pid]
        np.testing.assert_allclose(a.xyz, b.xyz)
        np.testing.assert_array_equal(a.rgb, b.rgb)
        np.testing.assert_allclose(a.error, b.error)
        np.testing.assert_array_equal(a.image_ids, b.image_ids)
        np.testing.assert_array_equal(a.point2D_idxs, b.point2D_idxs)
