"""Hermetic COLMAP reader tests: generated tiny binary/text fixtures instead of the
reference's hard-coded absolute dataset paths (src/scene/colmap_loader.cpp:288-310)."""

import numpy as np
import pytest

from gsplat_tpu.io import colmap


def _fixture_scene():
    cams = {
        1: colmap.Camera(id=1, model="PINHOLE", width=512, height=384,
                         params=np.array([400.0, 410.0, 256.0, 192.0])),
        2: colmap.Camera(id=2, model="SIMPLE_PINHOLE", width=64, height=48,
                         params=np.array([50.0, 32.0, 24.0])),
    }
    rng = np.random.default_rng(0)
    imgs = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        n_pts = 5 * i
        imgs[i] = colmap.Image(
            id=i,
            qvec=q,
            tvec=rng.normal(size=3),
            camera_id=1 + (i % 2),
            name=f"img_{i:03d}.png",
            xys=rng.normal(size=(n_pts, 2)),
            point3D_ids=rng.integers(-1, 100, size=n_pts).astype(np.int64),
        )
    return cams, imgs


def test_binary_roundtrip(tmp_path):
    cams, imgs = _fixture_scene()
    colmap.write_intrinsics_binary(cams, tmp_path / "cameras.bin")
    colmap.write_extrinsics_binary(imgs, tmp_path / "images.bin")
    cams2 = colmap.read_intrinsics_binary(tmp_path / "cameras.bin")
    imgs2 = colmap.read_extrinsics_binary(tmp_path / "images.bin")
    assert set(cams2) == {1, 2}
    assert cams2[1].model == "PINHOLE" and cams2[1].width == 512
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    assert set(imgs2) == {1, 2, 3}
    for i in imgs:
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(imgs2[i].tvec, imgs[i].tvec)
        assert imgs2[i].name == imgs[i].name
        assert imgs2[i].camera_id == imgs[i].camera_id
        np.testing.assert_allclose(imgs2[i].xys, imgs[i].xys)
        np.testing.assert_array_equal(imgs2[i].point3D_ids, imgs[i].point3D_ids)


def test_points3d_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(17, 3))
    rgb = rng.integers(0, 256, size=(17, 3)).astype(np.uint8)
    err = rng.random(17)
    colmap.write_points3D_binary(xyz, rgb, err, tmp_path / "points3D.bin")
    xyz2, rgb2, err2 = colmap.read_points3D_binary(tmp_path / "points3D.bin")
    np.testing.assert_allclose(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)
    np.testing.assert_allclose(err2, err)


def test_text_readers(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 512 384 400.0 410.0 256.0 192.0\n"
    )
    (tmp_path / "images.txt").write_text(
        "# comment\n"
        "1 0.9 0.1 0.2 0.3 1.0 2.0 3.0 1 img_001.png\n"
        "1.5 2.5 7 3.5 4.5 -1\n"
    )
    (tmp_path / "points3D.txt").write_text(
        "# comment\n5 1.0 2.0 3.0 10 20 30 0.5 1 0\n"
    )
    cams = colmap.read_intrinsics_text(tmp_path / "cameras.txt")
    assert cams[1].model == "PINHOLE" and cams[1].height == 384
    imgs = colmap.read_extrinsics_text(tmp_path / "images.txt")
    np.testing.assert_allclose(imgs[1].qvec, [0.9, 0.1, 0.2, 0.3])
    np.testing.assert_allclose(imgs[1].xys, [[1.5, 2.5], [3.5, 4.5]])
    np.testing.assert_array_equal(imgs[1].point3D_ids, [7, -1])
    xyz, rgb, err = colmap.read_points3D_text(tmp_path / "points3D.txt")
    np.testing.assert_allclose(xyz[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(rgb[0], [10, 20, 30])


def test_qvec2rotmat_golden():
    # identity and the (.5,.5,.5,.5) permutation (reference colmap_loader.cpp:265-279)
    np.testing.assert_allclose(colmap.qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))
    R = colmap.qvec2rotmat(np.array([0.5, 0.5, 0.5, 0.5]))
    np.testing.assert_allclose(R, [[0, 0, 1], [1, 0, 0], [0, 1, 0]], atol=1e-12)


def test_rotmat_qvec_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-9)
