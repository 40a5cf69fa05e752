"""Metrics logger backends (reference utils/utils_train.py:90-121).

The TensorBoard check decodes the written event file back through an
independent TFRecord/protobuf parser to prove stock TensorBoard would
accept it (framing CRCs + Event/Summary fields)."""

import json
import os
import struct

import pytest

from open_pandora_tpu.utils.loggers import (MetricsLogger, TensorBoardWriter,
                                            _masked_crc)


def _read_tfrecords(path):
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == _masked_crc(header), "header crc mismatch"
            data = f.read(length)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_d == _masked_crc(data), "data crc mismatch"
            out.append(data)
    return out


def _parse_fields(buf):
    """Minimal independent protobuf wire-format parser -> {field: [values]}."""
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
        num, wire = key >> 3, key & 7
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
            v = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            v = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        fields.setdefault(num, []).append(v)
    return fields


def test_tensorboard_event_file_roundtrip(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.log(3, {"train/loss": 0.5, "lr": 1e-4})
    w.log(4, {"train/loss": 0.25})
    w.close()
    files = [f for f in os.listdir(tmp_path)
             if f.startswith("events.out.tfevents.")]
    assert len(files) == 1
    records = _read_tfrecords(os.path.join(tmp_path, files[0]))
    assert len(records) == 3  # file_version + 2 steps

    head = _parse_fields(records[0])
    assert head[3] == [b"brain.Event:2"]

    ev = _parse_fields(records[1])
    assert ev[2] == [3]  # step
    summary = _parse_fields(ev[5][0])
    got = {}
    for val in summary[1]:
        v = _parse_fields(val)
        got[v[1][0].decode()] = v[2][0]
    assert got["train/loss"] == pytest.approx(0.5)
    assert got["lr"] == pytest.approx(1e-4)

    ev2 = _parse_fields(records[2])
    assert ev2[2] == [4]


def test_metrics_logger_multiplex(tmp_path):
    m = MetricsLogger(str(tmp_path), backends="tensorboard,csv")
    m.log(1, {"loss": 1.0, "grad_norm": 2.0})
    m.log(2, {"loss": 0.5, "grad_norm": 1.0})
    m.close()
    with open(tmp_path / "metrics.jsonl") as f:
        rows = [json.loads(line) for line in f]
    assert rows[0] == {"step": 1, "loss": 1.0, "grad_norm": 2.0}
    with open(tmp_path / "metrics.csv") as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "step,grad_norm,loss"
    assert lines[1] == "1,2.0,1.0"
    assert os.path.isdir(tmp_path / "tb")


def test_unknown_backend_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown logger backend"):
        MetricsLogger(str(tmp_path), backends="mlflow")
