"""tools/check_data.py — the scene-dir first-contact preflight (DAY_ONE.md).

Runs the real CLI as a subprocess against a generated synthetic scene
(PASS path, --colmap included) and against a deliberately broken scene
(empty mask → FAIL with a named finding)."""
import os
import subprocess
import sys

import imageio.v2 as imageio
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_scene(out, extra=()):
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/make_synthetic_scene.py"),
         str(out), "--task", "inpaint", "--H", "48", "--W", "64",
         "--n_train", "4", "--n_test", "2", *extra],
        check=True, capture_output=True, cwd=ROOT)


def _check(scene, extra=()):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/check_data.py"),
         str(scene), "--test_split_count", "2", *extra],
        capture_output=True, text=True, cwd=ROOT)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("cd") / "scene"
    _gen_scene(out, ("--colmap_sparse",))
    return out


def test_check_data_pass(scene):
    r = _check(scene, ("--colmap",))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout
    assert "kept keypoints/view" in r.stdout     # colmap section ran
    assert "FAIL" not in r.stdout


def test_check_data_flags_empty_mask(scene, tmp_path):
    import shutil

    broken = tmp_path / "scene"
    shutil.copytree(scene, broken)
    mdir = broken / "images_4" / "label"
    f = sorted(os.listdir(mdir))[0]
    img = imageio.imread(mdir / f)
    imageio.imwrite(mdir / f, np.zeros_like(img))
    r = _check(broken)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "non-empty inpaint mask" in r.stdout


def test_check_data_missing_poses_bounds(tmp_path):
    (tmp_path / "scene").mkdir()
    r = _check(tmp_path / "scene")
    assert r.returncode == 1
    assert "poses_bounds.npy" in r.stdout
