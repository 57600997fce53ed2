"""TensorBoard event-file writer (utils.tboard) and metrics sink tests."""
import glob
import os
import struct

import numpy as np

from mars_tpu.utils import tboard
from mars_tpu.utils.evaluation import AverageMeter
from mars_tpu.utils.logging import MetricsLogger


def test_crc32c_known_vector():
    # RFC 3720 test vector
    assert tboard.crc32c(b"123456789") == 0xE3069283
    assert tboard.crc32c(b"") == 0


def _read_records(path):
    """TFRecord reader with CRC verification (the format TB consumes)."""
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if not hdr:
                return out
            (n,) = struct.unpack("<Q", hdr)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == tboard._masked_crc(hdr)
            payload = f.read(n)
            (crc_p,) = struct.unpack("<I", f.read(4))
            assert crc_p == tboard._masked_crc(payload)
            out.append(payload)


def _decode_fields(buf):
    """Minimal proto wire decoder → {field: [values]}."""
    fields = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            (v,) = struct.unpack("<d", buf[i:i + 8])
            i += 8
        elif wire == 2:  # length-delimited
            n = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                n |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + n]
            i += n
        elif wire == 5:  # 32-bit
            (v,) = struct.unpack("<f", buf[i:i + 4])
            i += 4
        fields.setdefault(field, []).append(v)
    return fields


def test_event_file_roundtrip(tmp_path):
    w = tboard.SummaryWriter(str(tmp_path))
    w.add_scalar("test_mIoU", 41.5, step=3)
    w.add_scalar("loss", 0.25, step=4)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 3  # header + 2 scalars
    header = _decode_fields(records[0])
    assert header[3] == [b"brain.Event:2"]

    ev = _decode_fields(records[1])
    assert ev[2] == [3]  # step
    val = _decode_fields(_decode_fields(ev[5][0])[1][0])
    assert val[1] == [b"test_mIoU"]
    np.testing.assert_allclose(val[2][0], 41.5, rtol=1e-6)

    ev2 = _decode_fields(records[2])
    assert ev2[2] == [4]
    val2 = _decode_fields(_decode_fields(ev2[5][0])[1][0])
    assert val2[1] == [b"loss"]
    np.testing.assert_allclose(val2[2][0], 0.25, rtol=1e-6)


def test_metrics_logger(tmp_path):
    meter = AverageMeter("coco", [0, 1, 2])
    meter.update(np.array([50.0, 30.0]), np.array([80.0, 40.0]), 1)
    meter.update_bad_preds(np.array([5.0, 3.0]), np.array([8.0, 4.0]), 1)
    m = MetricsLogger(str(tmp_path), meter)
    m.log_metrics(0)
    m.log_time_batch(0.42, 0)
    m.log_metrics_bad_preds(0)
    m.end(12.3, 0)
    files = glob.glob(str(tmp_path / "tbd" / "runs" / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    tags = []
    for r in records[1:]:
        ev = _decode_fields(r)
        if 5 in ev:
            val = _decode_fields(_decode_fields(ev[5][0])[1][0])
            tags.append(val[1][0].decode())
    assert "test_mIoU" in tags and "test_FB-IoU" in tags
    assert "time_elapsed_batch" in tags and "bad_preds_mIoU" in tags
    assert "total_time_elapsed" in tags
    assert os.path.exists(tmp_path / "scalars.csv")
