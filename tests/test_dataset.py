"""Scene assembly tests: split, normalization, SceneInfo packaging, camera matrices."""

import numpy as np
import pytest

from gsplat_tpu.core.camera import load_camera, make_camera
from gsplat_tpu.io.dataset import (
    detect_scene_type,
    get_center_and_diag,
    get_nerfpp_norm,
    read_colmap_scene_info,
    split_train_test,
)
from tests.fixtures import make_colmap_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    return make_colmap_scene(root, n_cams=9, width=64, height=48, n_points=50)


def test_center_and_diag():
    # reference golden style (src/scene/dataset_readers.cpp:258-262)
    centers = np.array([[0.0, 0, 0], [2.0, 0, 0], [1.0, 0, 0]])
    c, d = get_center_and_diag(centers)
    np.testing.assert_allclose(c, [1.0, 0, 0])
    np.testing.assert_allclose(d, 1.0)


def test_scene_info(scene_dir):
    info = read_colmap_scene_info(scene_dir, eval_split=True)
    # llffhold=8: idx 0 and 8 go to test (reference dataset_readers.cpp:171-194)
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 7
    # sorted by image name
    names = [c.image_name for c in info.train_cameras + info.test_cameras]
    assert all(n.startswith("img_") for n in names)
    assert info.point_cloud.points.shape == (50, 3)
    assert float(info.nerf_normalization["radius"]) > 0
    assert detect_scene_type(scene_dir) == "colmap"


def test_scene_info_no_eval(scene_dir):
    info = read_colmap_scene_info(scene_dir, eval_split=False)
    assert len(info.test_cameras) == 0
    assert len(info.train_cameras) == 9


def test_split():
    cams = list(range(16))
    train, test = split_train_test(cams, True, llffhold=8)
    assert test == [0, 8]
    assert len(train) == 14


def test_nerfpp_norm(scene_dir):
    info = read_colmap_scene_info(scene_dir, eval_split=False)
    norm = get_nerfpp_norm(info.train_cameras)
    # cameras sit on a radius-4 circle around the origin; radius ~ 1.1*max dist
    assert 3.0 < float(norm["radius"]) < 6.0
    assert np.linalg.norm(norm["translate"]) < 1.0


def test_camera_matrices(scene_dir):
    info = read_colmap_scene_info(scene_dir, eval_split=False)
    cam = load_camera(info.train_cameras[0], resolution=1)
    assert cam.image.shape == (48, 64, 3)
    # full_proj == world_view @ proj (reference camera.cpp:66-71)
    wv = np.asarray(cam.world_view)
    fp = np.asarray(cam.full_proj)
    # camera center = inv(view)[3,:3]
    np.testing.assert_allclose(
        np.asarray(cam.cam_center), np.linalg.inv(wv)[3, :3], atol=1e-5
    )
    # a world point in front of the camera projects inside the frustum
    center_world = np.append(np.asarray(cam.cam_center), 1.0)
    view_dir = np.linalg.inv(wv)[2, :3]  # camera z row in world (row-vector conv)
    p = center_world[:3] + 3.0 * view_dir / np.linalg.norm(view_dir)
    clip = np.append(p, 1.0) @ fp
    ndc = clip[:3] / clip[3]
    assert -1.2 < ndc[0] < 1.2 and -1.2 < ndc[1] < 1.2


def test_resolution_cap():
    from gsplat_tpu.core.camera import _scaled_resolution
    from gsplat_tpu.io.dataset import CameraInfo

    info = CameraInfo(
        uid=0, R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=1.0, image=None,
        image_path="", image_name="x", width=3200, height=2400,
    )
    w, h = _scaled_resolution(info, -1)
    assert w == 1600 and h == 1200
    w, h = _scaled_resolution(info, 2)
    assert w == 1600 and h == 1200
    w, h = _scaled_resolution(info, 800)
    assert w == 800 and h == 600
