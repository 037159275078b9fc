"""Native library tests — mirrors the reference's torchsearchsorted test
strategy (test_searchsorted.py: parametrized shapes × sides against a numpy
oracle; SURVEY.md §4)."""
import numpy as np
import pytest

from gbnerf_tpu.data import native
from gbnerf_tpu.data.colmap import (Point3D, write_points3d_binary,
                                    read_points3d_binary)


def test_native_builds():
    assert native.available(), "native library failed to build"


@pytest.mark.parametrize("ba,bv,a_len,v_len", [
    (1, 1, 8, 5), (1, 16, 100, 50), (16, 16, 100, 50), (4, 4, 200, 500),
])
@pytest.mark.parametrize("side", ["left", "right"])
def test_searchsorted_matches_numpy(ba, bv, a_len, v_len, side, rng):
    for _ in range(10):
        a = np.sort(rng.random((ba, a_len)).astype(np.float32), -1)
        v = rng.random((bv, v_len)).astype(np.float32) * 1.2 - 0.1
        got = native.searchsorted(a, v, side)
        want = np.stack([
            np.searchsorted(a[0 if ba == 1 else i], v[i], side)
            for i in range(bv)])
        np.testing.assert_array_equal(got, want)


def test_searchsorted_with_ties(rng):
    a = np.asarray([[0.0, 1.0, 1.0, 1.0, 2.0]], np.float32)
    v = np.asarray([[1.0, 0.0, 2.0, 3.0, -1.0]], np.float32)
    np.testing.assert_array_equal(native.searchsorted(a, v, "left")[0],
                                  np.searchsorted(a[0], v[0], "left"))
    np.testing.assert_array_equal(native.searchsorted(a, v, "right")[0],
                                  np.searchsorted(a[0], v[0], "right"))


def test_build_rays_matches_numpy(rng):
    from gbnerf_tpu.data.rays_bank import _full_image_rays_np

    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    pose = np.concatenate([q, rng.normal(size=(3, 1))], 1).astype(np.float32)
    H, W, focal = 12, 17, 20.0
    ro, rd = native.build_rays(pose[None], H, W, focal)
    oro, ord_ = _full_image_rays_np(H, W, focal, pose)
    np.testing.assert_allclose(ro[0], oro.reshape(-1, 3), atol=1e-5)
    np.testing.assert_allclose(rd[0], ord_.reshape(-1, 3), atol=1e-5)


def test_colmap_points3d_native_matches_python(tmp_path, rng):
    pts = {}
    for i in range(1, 20):
        tl = rng.integers(1, 6)
        pts[i] = Point3D(
            id=i, xyz=rng.normal(size=3), rgb=(rng.random(3) * 255).astype(np.uint8),
            error=float(rng.random()),
            image_ids=rng.integers(1, 10, tl).astype(np.int32),
            point2D_idxs=rng.integers(0, 100, tl).astype(np.int32))
    path = str(tmp_path / "points3D.bin")
    write_points3d_binary(pts, path)

    # python parser roundtrip
    back = read_points3d_binary(path)
    assert len(back) == len(pts)
    np.testing.assert_allclose(back[5].xyz, pts[5].xyz)

    # native parser
    arrs = native.read_points3d_arrays(path)
    assert len(arrs["ids"]) == len(pts)
    order = np.argsort(arrs["ids"])
    for k, i in enumerate(sorted(pts.keys())):
        j = order[k]
        np.testing.assert_allclose(arrs["xyz"][j], pts[i].xyz)
        np.testing.assert_allclose(arrs["error"][j], pts[i].error)
        if "track_offsets" in arrs:
            o0, o1 = arrs["track_offsets"][j], arrs["track_offsets"][j + 1]
            np.testing.assert_array_equal(
                arrs["track_image_ids"][o0:o1], pts[i].image_ids)
