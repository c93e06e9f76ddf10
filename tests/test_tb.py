"""TensorBoard event-file writer: round-trip against the real TF parser.

The writer (gsplat_tpu/train/tb.py) hand-encodes the Event/Summary protos and
TFRecord framing; this test decodes the produced file with tensorflow's own
`event_pb2` + an independent TFRecord deframe (re-checking the masked CRCs) so
a TensorBoard binary would accept the file byte-for-byte.
"""

import struct

import pytest


def _deframe(data: bytes):
    """TFRecord stream -> list of payloads, verifying both masked CRCs."""
    from gsplat_tpu.train.tb import _masked_crc

    out = []
    i = 0
    while i < len(data):
        hdr = data[i : i + 8]
        (length,) = struct.unpack("<Q", hdr)
        (hcrc,) = struct.unpack("<I", data[i + 8 : i + 12])
        assert hcrc == _masked_crc(hdr)
        payload = data[i + 12 : i + 12 + length]
        (pcrc,) = struct.unpack("<I", data[i + 12 + length : i + 16 + length])
        assert pcrc == _masked_crc(payload)
        out.append(payload)
        i += 16 + length
    return out


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    from gsplat_tpu.train.tb import _crc32c

    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def test_tb_roundtrip(tmp_path):
    from gsplat_tpu.train.tb import TBWriter

    w = TBWriter(tmp_path)
    w.scalar("train/loss", 0.25, 10)
    w.scalars(20, psnr=31.5, n_gaussians=1234, name="skipped-non-numeric")
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    payloads = _deframe(files[0].read_bytes())
    assert len(payloads) == 4  # file_version + 3 scalars

    event_pb2 = pytest.importorskip("tensorflow.core.util.event_pb2")
    events = []
    for p in payloads:
        ev = event_pb2.Event()
        ev.ParseFromString(p)
        events.append(ev)

    assert events[0].file_version == "brain.Event:2"
    got = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            got[(v.tag, ev.step)] = v.simple_value
        assert ev.wall_time > 1e9
    assert got[("train/loss", 10)] == pytest.approx(0.25)
    assert got[("psnr", 20)] == pytest.approx(31.5)
    assert got[("n_gaussians", 20)] == pytest.approx(1234.0)


def test_metrics_logger_writes_tb(tmp_path):
    from gsplat_tpu.train.metrics import MetricsLogger

    m = MetricsLogger(str(tmp_path))
    m.log(5, loss=0.5, note="text-ignored-by-tb")
    m.close()
    assert (tmp_path / "metrics.jsonl").exists()
    tb_files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(tb_files) == 1
    payloads = _deframe(tb_files[0].read_bytes())
    assert len(payloads) == 2  # file_version + the loss scalar
