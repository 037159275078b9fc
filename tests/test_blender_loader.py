import json
import os

import numpy as np
import pytest

from gbnerf_tpu.config import Config, DataConfig
from gbnerf_tpu.data.blender import load_blender_data, pose_spherical
from gbnerf_tpu.train.loop import load_scene


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory, ):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("blender")
    H = W = 20
    for split, n in (("train", 3), ("val", 1), ("test", 2)):
        os.makedirs(d / split, exist_ok=True)
        frames = []
        for k in range(n):
            name = f"r_{k}"
            rgba = (rng.random((H, W, 4)) * 255).astype(np.uint8)
            imageio.imwrite(str(d / split / f"{name}.png"), rgba)
            pose = np.asarray(pose_spherical(360 * k / n, -30.0, 4.0))
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": pose.tolist()})
            if split == "train":
                os.makedirs(d / "mask", exist_ok=True)
                os.makedirs(d / "object", exist_ok=True)
                m = (rng.random((H, W)) * 255).astype(np.uint8)
                imageio.imwrite(str(d / "mask" / f"m_{k}.png"), m)
                imageio.imwrite(str(d / "object" / f"o_{k}.png"), m)
        meta = {"camera_angle_x": 0.8, "frames": frames}
        with open(d / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(d)


def test_load_blender(blender_dir):
    imgs, poses, render_poses, hwf, i_split, masks, objects = \
        load_blender_data(blender_dir, testskip=1)
    assert imgs.shape == (6, 20, 20, 4)
    assert poses.shape == (6, 4, 4)
    assert render_poses.shape == (40, 4, 4)
    assert len(i_split[0]) == 3 and len(i_split[2]) == 2
    assert masks.shape == (3, 20, 20)
    np.testing.assert_allclose(
        hwf[2], 0.5 * 20 / np.tan(0.4), rtol=1e-6)


def test_load_scene_dispatch_blender(blender_dir):
    cfg = Config(data=DataConfig(datadir=blender_dir, dataset_type="blender",
                                 testskip=1))
    scene = load_scene(cfg)
    assert scene.images.shape == (3, 20, 20, 3)
    assert scene.poses.shape == (3, 3, 5)
    assert scene.poses_test.shape == (2, 3, 5)
    assert scene.near == 2.0 and scene.far == 6.0


def test_load_scene_unknown_type():
    cfg = Config(data=DataConfig(datadir="/tmp", dataset_type="bogus"))
    with pytest.raises(SystemExit):
        load_scene(cfg)
