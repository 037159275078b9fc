"""DTU / NeRD loader + caption-prep tool tests (parity rows 23/26).

Reference loaders: /root/reference/DS_NeRF/load_dtu.py,
load_nerd.py:244+, comp_caption.py.
"""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dtu_dir(tmp_path_factory):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("dtu")
    os.makedirs(d / "image")
    H = W = 16
    n = 3
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
    cams = {}
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        imageio.imwrite(str(d / "image" / f"{i:03d}.png"), img)
        th = 0.3 * i
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1.0]])
        t = np.array([0.1 * i, 0.0, 2.0])
        P = np.eye(4)
        P[:3] = K @ np.concatenate([R, t[:, None]], axis=1)
        cams[f"world_mat_{i}"] = P
        cams[f"scale_mat_{i}"] = np.eye(4)
    np.savez(str(d / "cameras.npz"), **cams)
    return str(d)


def test_load_dtu(dtu_dir):
    from gbnerf_tpu.data.blender import load_dtu_data

    imgs, poses, hwf = load_dtu_data(dtu_dir)
    assert imgs.shape == (3, 16, 16, 3)
    assert poses.shape == (3, 3, 4)
    assert np.isfinite(poses).all()
    H, W, focal = hwf
    assert (H, W) == (16, 16)
    assert abs(focal - 20.0) < 0.5
    # rotation part stays orthonormal through the OpenGL flip
    RtR = poses[1, :3, :3] @ poses[1, :3, :3].T
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)


@pytest.fixture(scope="module")
def nerd_dir(tmp_path_factory):
    import imageio.v2 as imageio

    rng = np.random.default_rng(1)
    d = tmp_path_factory.mktemp("nerd")
    H, W, n = 12, 16, 4
    os.makedirs(d / "images_4")
    os.makedirs(d / "masks_4")
    for i in range(n):
        imageio.imwrite(str(d / "images_4" / f"{i:03d}.png"),
                        (rng.random((H, W, 3)) * 255).astype(np.uint8))
        m = np.zeros((H, W), np.uint8)
        m[3:9, 4:12] = 255
        imageio.imwrite(str(d / "masks_4" / f"{i:03d}.png"), m)
    # poses_bounds: [N, 17] = 3x5 pose (with hwf col) + 2 bounds
    poses = np.zeros((n, 3, 5), np.float32)
    for i in range(n):
        poses[i, :3, :3] = np.eye(3)
        poses[i, :3, 3] = [0.1 * i, 0, 0]
        poses[i, :3, 4] = [H, W, 20.0]
    pb = np.concatenate([poses.reshape(n, -1),
                         np.tile([1.0, 5.0], (n, 1))], axis=1)
    np.save(str(d / "poses_bounds.npy"), pb)
    return str(d)


def test_load_nerd(nerd_dir):
    from gbnerf_tpu.data.llff import load_nerd_data

    scene = load_nerd_data(nerd_dir, factor=4, recenter=False)
    assert scene.images.shape == (4, 12, 16, 3)
    assert scene.masks.shape == (4, 12, 16)
    assert set(np.unique(scene.masks)) <= {0.0, 1.0}
    # objects carried in the inpainted_depths slot: white outside the mask
    obj = scene.inpainted_depths
    assert obj.shape == (4, 12, 16)
    assert np.allclose(obj[0][scene.masks[0] == 0], 1.0)


def test_comp_caption_tool(tmp_path):
    d = tmp_path / "caps"
    os.makedirs(d)
    (d / "a.txt").write_text("a photo of a chair")
    (d / "b.txt").write_text("RGB image, already tagged")
    (d / "c.notxt").write_text("ignored")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "comp_caption.py"),
         str(d), "--prefix", "RGB image"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (d / "a.txt").read_text() == "RGB image, a photo of a chair"
    # idempotent: already-prefixed untouched
    assert (d / "b.txt").read_text() == "RGB image, already tagged"
    assert (d / "c.notxt").read_text() == "ignored"
