"""Blender / NeRF-synthetic loader tests (upstream readNerfSyntheticInfo; empty
body in the reference, src/scene/dataset_readers.cpp:223-229)."""

import json
import math

import numpy as np
import pytest
from PIL import Image as PILImage

from gsplat_tpu.io.dataset import (
    detect_scene_type,
    read_blender_scene_info,
)


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender")
    rng = np.random.default_rng(0)
    (root / "train").mkdir()
    (root / "test").mkdir()
    frames_train, frames_test = [], []
    for split, frames, n in (("train", frames_train, 4), ("test", frames_test, 2)):
        for i in range(n):
            ang = 2 * math.pi * i / n
            c2w = np.eye(4)
            c2w[:3, 3] = [4 * math.sin(ang), 0, 4 * math.cos(ang)]
            # RGBA image
            arr = rng.integers(0, 256, size=(32, 40, 4), dtype=np.uint8)
            name = f"./{split}/r_{i}"
            PILImage.fromarray(arr, "RGBA").save(root / split / f"r_{i}.png")
            frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    for split, frames in (("train", frames_train), ("test", frames_test)):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return root


def test_detect(blender_scene):
    assert detect_scene_type(blender_scene) == "blender"


def test_load_eval_split(blender_scene):
    info = read_blender_scene_info(
        blender_scene, white_background=True, eval_split=True, num_init_points=500
    )
    assert len(info.train_cameras) == 4
    assert len(info.test_cameras) == 2
    cam = info.train_cameras[0]
    assert cam.width == 40 and cam.height == 32
    assert cam.fovx == pytest.approx(0.7)
    # fovy derived from fovx via focal
    assert cam.fovy == pytest.approx(
        2 * math.atan(32 / (2 * (40 / (2 * math.tan(0.35))))), rel=1e-6
    )
    # RGBA composited onto white background -> 3 channels in [0,1]
    assert cam.image.shape == (32, 40, 3)
    # random init point cloud created
    assert len(info.point_cloud.points) == 500
    assert np.abs(info.point_cloud.points).max() <= 1.3
    assert info.nerf_normalization["radius"] > 0


def test_load_merged_when_not_eval(blender_scene):
    info = read_blender_scene_info(blender_scene, eval_split=False)
    assert len(info.train_cameras) == 6
    assert len(info.test_cameras) == 0
