"""PLY codec round-trip tests (no reference equivalent; upstream uses plyfile)."""

import numpy as np

from gsplat_tpu.io.ply import (
    fetch_ply,
    load_gaussian_ply,
    read_ply,
    save_gaussian_ply,
    store_ply,
    write_ply,
)


def test_write_read_roundtrip(tmp_path):
    cols = {
        "x": np.arange(5, dtype=np.float32),
        "y": np.arange(5, dtype=np.float32) * 2,
        "red": np.arange(5, dtype=np.uint8),
    }
    write_ply(tmp_path / "t.ply", cols)
    out = read_ply(tmp_path / "t.ply")
    for k in cols:
        np.testing.assert_array_equal(out[k], cols[k])


def test_store_fetch_pointcloud(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, size=(20, 3)).astype(np.uint8)
    store_ply(tmp_path / "pc.ply", xyz, rgb)
    pcd = fetch_ply(tmp_path / "pc.ply")
    np.testing.assert_allclose(pcd.points, xyz, rtol=1e-6)
    np.testing.assert_allclose(pcd.colors, rgb / 255.0, rtol=1e-6)
    assert pcd.normals.shape == (20, 3)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n, m = 7, 15
    data = {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "features_dc": rng.normal(size=(n, 3)).astype(np.float32),
        "features_rest": rng.normal(size=(n, m, 3)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    save_gaussian_ply(
        tmp_path / "g.ply",
        data["xyz"],
        data["features_dc"],
        data["features_rest"],
        data["opacity"],
        data["scaling"],
        data["rotation"],
    )
    out = load_gaussian_ply(tmp_path / "g.ply")
    for k in data:
        np.testing.assert_allclose(out[k], data[k], rtol=1e-6, err_msg=k)
