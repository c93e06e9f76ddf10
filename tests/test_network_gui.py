"""Network GUI: upstream SIBR wire-format endpoint + HTTP preview on one port.

The client side below speaks exactly the byte protocol of upstream 3DGS's
`network_gui.py` (u32-LE length + JSON request; raw RGB bytes + u32-LE length
+ verify string back), so it stands in for the SIBR remote viewer.
"""

import json
import socket
import struct
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

from gsplat_tpu.network_gui import NetworkGUIServer

REPO = Path(__file__).resolve().parents[1]


def _sibr_request(width, height, wv, fp, train=True, keep_alive=True):
    return {
        "resolution_x": width, "resolution_y": height, "train": train,
        "fov_y": 0.8, "fov_x": 1.2, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": keep_alive, "scaling_modifier": 1.0,
        "view_matrix": [float(x) for x in np.asarray(wv).reshape(-1)],
        "view_projection_matrix": [float(x) for x in np.asarray(fp).reshape(-1)],
    }


def _send_msg(conn, msg: dict):
    payload = json.dumps(msg).encode("utf-8")
    conn.sendall(struct.pack("<I", len(payload)) + payload)


def _recv_exact(conn, n):
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        assert part, "server closed early"
        buf += part
    return buf


def _recv_reply(conn, width, height):
    img = _recv_exact(conn, width * height * 3) if width else b""
    (vlen,) = struct.unpack("<I", _recv_exact(conn, 4))
    verify = _recv_exact(conn, vlen).decode("ascii")
    return img, verify


def test_protocol_roundtrip(tmp_path):
    srv = NetworkGUIServer(tmp_path, ip="127.0.0.1", port=0, verify="/data/x")
    assert srv.url

    # mock trainer: reply to every polled request with a solid color
    stop = threading.Event()

    def trainer():
        while not stop.is_set():
            req = srv.poll()
            if req is None:
                time.sleep(0.005)
                continue
            if req.world_view is not None:
                assert req.world_view.shape == (4, 4)
                req.reply(b"\x10\x20\x30" * (req.width * req.height))
            else:
                req.reply(None)

    t = threading.Thread(target=trainer, daemon=True)
    t.start()
    try:
        conn = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        wv = np.eye(4, dtype=np.float32)
        _send_msg(conn, _sibr_request(8, 4, wv, wv))
        img, verify = _recv_reply(conn, 8, 4)
        assert img == b"\x10\x20\x30" * 32
        assert verify == "/data/x"

        # resolution 0 round-trip (viewer handshake): no image, just verify
        _send_msg(conn, {"resolution_x": 0, "resolution_y": 0, "train": True,
                         "keep_alive": True})
        img, verify = _recv_reply(conn, 0, 0)
        assert img == b"" and verify == "/data/x"

        # keep_alive=False closes the connection after the reply
        _send_msg(conn, _sibr_request(2, 2, wv, wv, keep_alive=False))
        _recv_reply(conn, 2, 2)
        time.sleep(0.1)
        assert conn.recv(1) == b""  # orderly close
        conn.close()
    finally:
        stop.set()
        srv.close()


def test_http_preview_on_same_port(tmp_path):
    (tmp_path / "metrics.jsonl").write_text(json.dumps({"step": 1, "loss": 0.5}) + "\n")
    srv = NetworkGUIServer(tmp_path, ip="127.0.0.1", port=0)
    try:
        base = f"http://127.0.0.1:{srv.port}"
        html = urllib.request.urlopen(f"{base}/", timeout=5).read().decode()
        assert "gsplat-tpu" in html
        srv.publish(np.zeros((8, 8, 3), np.float32))
        jpg = urllib.request.urlopen(f"{base}/preview.jpg", timeout=5).read()
        assert jpg[:2] == b"\xff\xd8"
        rows = json.loads(urllib.request.urlopen(f"{base}/metrics", timeout=5).read())
        assert rows[-1]["loss"] == 0.5
    finally:
        srv.close()


def test_port_conflict_is_soft(tmp_path):
    s1 = NetworkGUIServer(tmp_path, ip="127.0.0.1", port=0)
    s2 = NetworkGUIServer(tmp_path, ip="127.0.0.1", port=s1.port)
    assert s2.url is None
    s2.publish(np.zeros((2, 2, 3)))  # no-op
    s1.close()


def test_gui_render_during_training(tmp_path):
    """End-to-end: a SIBR-protocol client gets a custom-camera render out of a
    live `python -m gsplat_tpu.cli` training run."""
    from tests.fixtures import make_colmap_scene

    from gsplat_tpu.core.camera import make_camera

    scene = tmp_path / "scene"
    make_colmap_scene(scene, n_cams=3, width=32, height=24, n_points=40)
    port = _free_port()
    wrapper = (
        "import sys, jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_compilation_cache_dir','/tmp/jax_cache_tests');"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',0.0);"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes',0);"
        "from gsplat_tpu.cli import main; sys.exit(main())"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", wrapper,
         "--source_path", str(scene), "--model_path", str(tmp_path / "out"),
         "--iterations", "300", "--capacity", "64", "--pair_budget", "2048",
         "--chunk_size", "32", "--ip", "127.0.0.1", "--port", str(port)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        conn = None
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                conn = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                if proc.poll() is not None:
                    raise AssertionError(
                        "trainer exited early:\n"
                        + proc.stdout.read().decode(errors="replace")
                    )
                time.sleep(0.5)
        assert conn is not None, "could not connect to network GUI"

        cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]),
                          fovx=1.2, fovy=0.8, width=16, height=8)
        _send_msg(conn, _sibr_request(
            16, 8, np.asarray(cam.world_view), np.asarray(cam.full_proj)))
        conn.settimeout(180)
        img, verify = _recv_reply(conn, 16, 8)
        assert len(img) == 16 * 8 * 3
        assert verify == str(scene)
        conn.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _cpu_env():
    import os

    env = dict(os.environ)
    env["GSPLAT_CACHE_DIR"] = "/tmp/jax_cache_tests"
    return env


def test_split_first_segment_still_http(tmp_path):
    """A 2-byte first TCP segment must not misclassify HTTP as SIBR."""
    (tmp_path / "metrics.jsonl").write_text("{}\n")
    srv = NetworkGUIServer(tmp_path, ip="127.0.0.1", port=0)
    try:
        c = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        c.sendall(b"GE")
        time.sleep(0.1)
        c.sendall(b"T / HTTP/1.1\r\nHost: x\r\n\r\n")
        c.settimeout(5)
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = c.recv(4096)
            if not chunk:
                break
            resp += chunk
        assert resp.startswith(b"HTTP/1.0 200"), resp[:40]
        c.close()
    finally:
        srv.close()


def test_probe_connect_close_is_harmless(tmp_path):
    """Port scanners that connect and immediately close must not crash the
    server (empty MSG_PEEK -> clean return) and it keeps serving."""
    srv = NetworkGUIServer(tmp_path, ip="127.0.0.1", port=0)
    try:
        for _ in range(3):
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
            s.close()
        time.sleep(0.2)
        # still serving HTTP afterwards
        (tmp_path / "metrics.jsonl").write_text("{}\n")
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=5).read().decode()
        assert "gsplat-tpu" in html
    finally:
        srv.close()
