"""Mesh export: marching tetrahedra + density-grid pipeline + writers.

Verified properties (no external mesh library exists in this image, so the
checks are from first principles):
  * analytic sphere: every extracted vertex lies within one grid spacing of
    the true radius; surface area approaches 4πR²
  * watertightness: every edge of the extracted closed surface is shared by
    exactly two triangles (the face-consistency of the 6-tet decomposition)
  * orientation: all triangle normals point outward for a convex body
  * writers: OBJ roundtrip parses back to the same mesh; PLY header/counts
"""
import io
import os

import numpy as np
import pytest

from gbnerf_tpu.utils.mesh import (density_grid, extract_field_mesh,
                                   marching_tetrahedra, write_obj, write_ply)

R_SPHERE = 0.6


def _sphere_grid(res=48, bound=1.0):
    ax = np.linspace(-bound, bound, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    # smooth density: positive inside the sphere, negative outside
    return R_SPHERE - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)


def test_sphere_surface_accuracy():
    res, bound = 48, 1.0
    grid = _sphere_grid(res, bound)
    verts, faces = marching_tetrahedra(grid, 0.0, (-bound,) * 3, (bound,) * 3)
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(verts, axis=1)
    h = 2 * bound / (res - 1)
    np.testing.assert_array_less(np.abs(r - R_SPHERE), h)
    # area converges to 4πR² (tet surface slightly overcounts; 5% slack)
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    area = 0.5 * np.linalg.norm(fn, axis=1).sum()
    assert abs(area - 4 * np.pi * R_SPHERE ** 2) < 0.05 * 4 * np.pi * R_SPHERE ** 2


def test_sphere_watertight_and_oriented():
    grid = _sphere_grid(32)
    verts, faces = marching_tetrahedra(grid, 0.0, (-1.0,) * 3, (1.0,) * 3)
    # watertight: every undirected edge appears in exactly two faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), np.unique(counts)
    # oriented: outward normals for the convex sphere (centroid at origin)
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    centers = verts[faces].mean(1)
    assert (np.einsum("ij,ij->i", fn, centers) > 0).all()


def test_empty_and_full_grids():
    for fill in (-1.0, 1.0):
        grid = np.full((8, 8, 8), fill, np.float32)
        verts, faces = marching_tetrahedra(grid, 0.0)
        assert len(verts) == 0 and len(faces) == 0


def test_density_grid_slab_assembly():
    # slab loop must reproduce a direct evaluation incl. the ragged tail
    def sigma(pts):
        p = np.asarray(pts)
        return (p ** 2).sum(-1) - 0.3 * p[:, 0]

    res = 13  # not a multiple of the slab size
    g = density_grid(sigma, res, (-1, -1, -1), (1, 1, 1), slab=4)
    ax = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    ref = sigma(np.stack([X, Y, Z], -1).reshape(-1, 3)).reshape(res, res, res)
    np.testing.assert_allclose(g, ref, rtol=1e-6, atol=1e-6)


def test_extract_field_mesh_end_to_end():
    """Field-fn contract (make_field_fn shape/semantics) → colored mesh."""
    import jax.numpy as jnp

    def field_fn(pts, viewdirs, sigma_only=False):
        d = jnp.linalg.norm(pts, axis=-1)
        sig = 40.0 * (R_SPHERE - d)          # raw σ, crosses iso=0 at R
        rgb_logit = jnp.stack(
            [pts[..., 0], pts[..., 1], pts[..., 2]], axis=-1)
        return jnp.concatenate([rgb_logit, sig[..., None]], axis=-1)

    verts, faces, cols = extract_field_mesh(
        field_fn, resolution=24, bound=1.0, iso=0.0, color=True, batch=512)
    assert len(verts) > 100
    assert cols.shape == (len(verts), 3) and cols.dtype == np.uint8
    r = np.linalg.norm(verts, axis=1)
    h = 2.0 / 23
    np.testing.assert_array_less(np.abs(r - R_SPHERE), h)
    # color = sigmoid(position logit): +x hemisphere must be redder
    red = cols[:, 0].astype(np.float32)
    assert red[verts[:, 0] > 0.3].mean() > red[verts[:, 0] < -0.3].mean()


def test_obj_roundtrip(tmp_path):
    grid = _sphere_grid(16)
    verts, faces = marching_tetrahedra(grid, 0.0, (-1.0,) * 3, (1.0,) * 3)
    path = str(tmp_path / "m.obj")
    write_obj(path, verts, faces)
    vs, fs = [], []
    for line in open(path):
        p = line.split()
        if not p:
            continue
        if p[0] == "v":
            vs.append([float(x) for x in p[1:4]])
        elif p[0] == "f":
            fs.append([int(x) - 1 for x in p[1:4]])
    np.testing.assert_allclose(np.array(vs, np.float32), verts, atol=1e-5)
    assert (np.array(fs) == faces).all()


def test_ply_writer(tmp_path):
    grid = _sphere_grid(16)
    verts, faces = marching_tetrahedra(grid, 0.0, (-1.0,) * 3, (1.0,) * 3)
    cols = np.full((len(verts), 3), 128, np.uint8)
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces, cols)
    blob = open(path, "rb").read()
    hdr_end = blob.index(b"end_header\n") + len(b"end_header\n")
    hdr = blob[:hdr_end].decode()
    assert f"element vertex {len(verts)}" in hdr
    assert f"element face {len(faces)}" in hdr
    body = blob[hdr_end:]
    assert len(body) == len(verts) * 15 + len(faces) * 13
