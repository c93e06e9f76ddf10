"""Upstream-compatible network GUI endpoint on the reference's ip/port flags.

The reference parses --ip/--port and never uses them
(src/arguments/params.h:110-111); upstream 3DGS binds them to the SIBR remote
viewer's TCP protocol (`gaussian_renderer/network_gui.py` in the public INRIA
trainer): the trainer LISTENS, the viewer connects and, per round-trip, sends

    [u32-LE length][JSON payload]

with keys resolution_x/resolution_y, train, fov_y, fov_x, z_near, z_far,
shs_python, rot_scale_python, keep_alive, scaling_modifier, view_matrix (16
floats, row-vector/transposed convention) and view_projection_matrix (16
floats); the trainer replies

    [H*W*3 raw uint8 RGB bytes (only when resolution_x > 0)]
    [u32-LE length][verify string (the model path)]

This module implements that wire format AND keeps the browser viewer: the
accept loop sniffs each connection's first bytes — an HTTP verb hands the
socket to the HTTP preview handler (viewer.ViewerServer's page), anything else
speaks the SIBR protocol. One port, both clients.

Threading model: sockets are owned by daemon threads; the TRAINING thread owns
all JAX work. A connection thread parses one request, parks it in `pending`,
and blocks on its reply slot; the train loop calls `poll()` every iteration,
renders the requested view, and `reply()` unblocks the connection thread. If
the viewer pauses training (train=False), the loop should keep polling — see
train.loop.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

_HTTP_VERBS = (b"GET ", b"POST", b"HEAD", b"PUT ", b"OPTI", b"DELE")


@dataclass
class GuiRequest:
    """One parsed viewer round-trip, owned by a connection thread."""
    width: int
    height: int
    do_training: bool
    keep_alive: bool
    scaling_modifier: float
    world_view: Optional[np.ndarray]      # (4,4) f32, row-vector convention
    full_proj: Optional[np.ndarray]       # (4,4) f32
    fovx: float
    fovy: float
    shs_python: bool = False
    rot_scale_python: bool = False
    _done: threading.Event = field(default_factory=threading.Event)
    _image: Optional[bytes] = None

    def reply(self, image: Optional[bytes]) -> None:
        self._image = image
        self._done.set()


def parse_message(msg: dict) -> GuiRequest:
    w, h = int(msg["resolution_x"]), int(msg["resolution_y"])
    wv = fp = None
    if w > 0 and h > 0:
        wv = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
        fp = np.asarray(msg["view_projection_matrix"], np.float32).reshape(4, 4)
    return GuiRequest(
        width=w, height=h,
        do_training=bool(msg.get("train", True)),
        keep_alive=bool(msg.get("keep_alive", True)),
        scaling_modifier=float(msg.get("scaling_modifier", 1.0)),
        world_view=wv, full_proj=fp,
        fovx=float(msg.get("fov_x", 1.0)), fovy=float(msg.get("fov_y", 1.0)),
        shs_python=bool(msg.get("shs_python", False)),
        rot_scale_python=bool(msg.get("rot_scale_python", False)),
    )


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        if not part:
            raise ConnectionError("peer closed")
        buf += part
    return buf


def read_message(conn: socket.socket) -> dict:
    (length,) = struct.unpack("<I", _recv_exact(conn, 4))
    if length > 1 << 20:
        raise ConnectionError(f"implausible message length {length}")
    return json.loads(_recv_exact(conn, length).decode("utf-8"))


def send_reply(conn: socket.socket, image: Optional[bytes], verify: str) -> None:
    if image:
        conn.sendall(image)
    v = verify.encode("ascii")
    conn.sendall(struct.pack("<I", len(v)) + v)


class NetworkGUIServer:
    """Dual-protocol (SIBR wire format + HTTP preview) server for training."""

    def __init__(self, model_dir, ip: str = "127.0.0.1", port: int = 6009,
                 verify: str = ""):
        from gsplat_tpu.viewer import _Handler

        self.model_dir = model_dir
        self.verify = verify or str(model_dir)
        self._pending: list[GuiRequest] = []
        self._lock = threading.Lock()
        self._sibr_alive = 0  # live SIBR connections (pause ends when 0)
        self._sock: Optional[socket.socket] = None
        self._http_handler = type("_H", (_Handler,), {"model_dir": model_dir})
        self.training_paused = False
        try:
            s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind((ip, port))
            s.listen(8)
            self._sock = s
            self.port = s.getsockname()[1]
            self.url = f"http://{ip}:{self.port}/"
            threading.Thread(target=self._accept_loop, daemon=True).start()
        except OSError as e:  # best-effort, like the HTTP viewer
            self.url = None
            self._err = str(e)

    # -- socket side (daemon threads) --------------------------------------

    def _accept_loop(self) -> None:
        while self._sock is not None:
            try:
                conn, addr = self._sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve_conn, args=(conn, addr), daemon=True
            ).start()

    def _serve_conn(self, conn: socket.socket, addr) -> None:
        try:
            # a short first TCP segment must not misclassify the protocol:
            # peek until 4 bytes are buffered (or the peer closed)
            head = b""
            while len(head) < 4:
                head = conn.recv(4, socket.MSG_PEEK)
                if not head:
                    return
                if len(head) < 4:
                    time.sleep(0.005)
            if head[:4] in _HTTP_VERBS or head[:3] == b"GET":
                # hand the raw socket to the HTTP preview handler
                self._http_handler(conn, addr, None)
                return
            with self._lock:
                self._sibr_alive += 1
            try:
                while True:
                    req = parse_message(read_message(conn))
                    with self._lock:
                        self._pending.append(req)
                    if not req._done.wait(timeout=600.0):
                        return
                    send_reply(conn, req._image, self.verify)
                    if not req.keep_alive:
                        return
            finally:
                with self._lock:
                    self._sibr_alive -= 1
        except (ConnectionError, OSError, ValueError, json.JSONDecodeError,
                KeyError, TypeError, IndexError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    # -- trainer side (training thread) -------------------------------------

    def poll(self) -> Optional[GuiRequest]:
        """Next pending viewer request, or None. The caller must .reply()."""
        with self._lock:
            return self._pending.pop(0) if self._pending else None

    @property
    def sibr_connected(self) -> bool:
        with self._lock:
            return self._sibr_alive > 0

    def publish(self, image: np.ndarray) -> None:
        """Browser-preview path (same contract as viewer.ViewerServer)."""
        if self._sock is None:
            return
        from gsplat_tpu.viewer import write_preview

        write_preview(self.model_dir, image)

    def close(self) -> None:
        if self._sock is not None:
            s, self._sock = self._sock, None
            try:
                s.close()
            except OSError:
                pass


def camera_from_request(req: GuiRequest):
    """Build a render-ready Camera from the viewer's matrices (no GT image)."""
    import jax.numpy as jnp
    import math

    from gsplat_tpu.core.camera import Camera

    wv = np.asarray(req.world_view, np.float32)
    cam_center = np.linalg.inv(wv)[3, :3]
    return Camera(
        world_view=jnp.asarray(wv),
        full_proj=jnp.asarray(req.full_proj, jnp.float32),
        cam_center=jnp.asarray(cam_center, jnp.float32),
        tan_fovx=jnp.asarray(math.tan(req.fovx * 0.5), jnp.float32),
        tan_fovy=jnp.asarray(math.tan(req.fovy * 0.5), jnp.float32),
        image=None,
        width=req.width,
        height=req.height,
        image_name="network_gui",
        uid=-1,
    )


def image_to_bytes(image) -> bytes:
    """(H,W,3) float [0,1] -> raw uint8 RGB bytes (upstream's memoryview)."""
    arr = (np.clip(np.asarray(image), 0.0, 1.0) * 255).astype(np.uint8)
    return arr.tobytes()
