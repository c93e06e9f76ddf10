"""Viewer server tests: HTTP surface on the reference's ip/port flags."""

import json
import urllib.request

import numpy as np

from gsplat_tpu.viewer import ViewerServer


def test_viewer_serves_preview_and_metrics(tmp_path):
    (tmp_path / "metrics.jsonl").write_text(
        json.dumps({"step": 1, "loss": 0.5}) + "\n"
        + json.dumps({"step": 2, "loss": 0.25}) + "\n"
    )
    v = ViewerServer(tmp_path, ip="127.0.0.1", port=0)  # ephemeral port
    try:
        port = v._server.server_address[1]
        base = f"http://127.0.0.1:{port}"

        html = urllib.request.urlopen(f"{base}/").read().decode()
        assert "gsplat-tpu" in html

        # no preview yet -> 404
        try:
            urllib.request.urlopen(f"{base}/preview.jpg")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404

        v.publish(np.random.default_rng(0).random((16, 24, 3)))
        jpg = urllib.request.urlopen(f"{base}/preview.jpg").read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic

        rows = json.loads(urllib.request.urlopen(f"{base}/metrics").read())
        assert rows[-1]["loss"] == 0.25
    finally:
        v.close()


def test_viewer_port_conflict_is_soft(tmp_path):
    v1 = ViewerServer(tmp_path, port=0)
    port = v1._server.server_address[1]
    v2 = ViewerServer(tmp_path, ip="127.0.0.1", port=port)
    assert v2.url is None  # degraded, not crashed
    v2.publish(np.zeros((4, 4, 3)))  # no-op, no exception
    v1.close()
