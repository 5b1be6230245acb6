"""tfevents writer format tests (utils/tensorboard.py).

Decodes the written file with an independent minimal parser (TFRecord framing
+ protobuf wire format), checks CRC-32C against published test vectors, and
exercises the engine/main tag wiring.
"""
import os
import struct

import pytest

from toist_tpu.utils.tensorboard import (SummaryWriter, crc32c,
                                         encode_scalar_event, tfrecord)


def test_crc32c_vectors():
    # RFC 3720 / kernel crypto test vectors.
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def _mask(c):
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _read_records(path):
    """Independent TFRecord reader with CRC verification."""
    records = []
    with open(path, "rb") as f:
        blob = f.read()
    pos = 0
    while pos < len(blob):
        header = blob[pos:pos + 8]
        (length,) = struct.unpack("<Q", header)
        (len_crc,) = struct.unpack("<I", blob[pos + 8:pos + 12])
        assert len_crc == _mask(crc32c(header)), "length CRC mismatch"
        data = blob[pos + 12:pos + 12 + length]
        (data_crc,) = struct.unpack("<I",
                                    blob[pos + 12 + length:pos + 16 + length])
        assert data_crc == _mask(crc32c(data)), "data CRC mismatch"
        records.append(data)
        pos += 16 + length
    return records


def _decode_varint(buf, pos):
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def _decode_fields(buf):
    """proto wire decode -> list of (field, wire, value)."""
    fields = []
    pos = 0
    while pos < len(buf):
        key, pos = _decode_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _decode_varint(buf, pos)
        elif wire == 1:
            val = struct.unpack("<d", buf[pos:pos + 8])[0]
            pos += 8
        elif wire == 5:
            val = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        elif wire == 2:
            ln, pos = _decode_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        fields.append((field, wire, val))
    return fields


def _decode_event(data):
    out = {"scalars": {}}
    for field, _, val in _decode_fields(data):
        if field == 1:
            out["wall_time"] = val
        elif field == 2:
            out["step"] = val
        elif field == 3:
            out["file_version"] = val.decode()
        elif field == 5:
            for f2, _, v2 in _decode_fields(val):
                assert f2 == 1
                tag = simple = None
                for f3, _, v3 in _decode_fields(v2):
                    if f3 == 1:
                        tag = v3.decode()
                    elif f3 == 2:
                        simple = v3
                out["scalars"][tag] = simple
    return out


def test_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars({"training_loss": 1.5, "loss_ce": 0.25}, step=7)
    w.add_scalar("map@0.5_bbox", 0.4375, step=3)
    files = [f for f in os.listdir(tmp_path)
             if f.startswith("events.out.tfevents.")]
    assert len(files) == 1
    events = [_decode_event(r)
              for r in _read_records(os.path.join(tmp_path, files[0]))]
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 7
    assert events[1]["scalars"] == {"training_loss": 1.5, "loss_ce": 0.25}
    assert events[2]["step"] == 3
    assert events[2]["scalars"] == {"map@0.5_bbox": 0.4375}
    assert all(e.get("wall_time", 1.0) > 0 for e in events)


def test_writer_none_logdir_is_noop():
    w = SummaryWriter(None)
    w.add_scalars({"x": 1.0}, step=0)  # must not raise
    assert w.path is None


def test_large_varint_step(tmp_path):
    # steps > 2^31 exercise multi-byte varints.
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("t", 2.0, step=3_000_000_123)
    f = [x for x in os.listdir(tmp_path)][0]
    events = [_decode_event(r)
              for r in _read_records(os.path.join(tmp_path, f))]
    assert events[1]["step"] == 3_000_000_123


def test_engine_tb_tags(tmp_path):
    """train_one_epoch mirrors the reference's TB tags from the scalars."""
    import numpy as np

    from toist_tpu.train import engine

    class FakeState:
        step = 5

    class FakeIter:
        def __len__(self):
            return 1

        def epoch(self, e):
            yield {"images": np.zeros((1,))}

    def fake_step(state, batch, rng):
        return FakeState(), {
            "loss": np.float32(2.0), "loss_ce": np.float32(0.5),
            "loss_is_finite": np.float32(1.0), "grad_norm": np.float32(0.1),
            "bank_update_count": np.arange(3, dtype=np.int32),
            "bank_full": np.zeros((3,), np.int32)}

    w = SummaryWriter(str(tmp_path))
    engine.train_one_epoch(fake_step, FakeState(), FakeIter(), epoch=0,
                           rng=None, tb=w, print_freq=1)
    f = [x for x in os.listdir(tmp_path)][0]
    events = [_decode_event(r)
              for r in _read_records(os.path.join(tmp_path, f))]
    tags = events[1]["scalars"]
    assert tags["training_loss"] == 2.0
    assert tags["loss_ce"] == 0.5
    assert "loss_is_finite" not in tags      # not a reference TB tag
    assert tags["update_count_2"] == 1.0     # telemetry fans out per task
    assert tags["full_label_1"] == 0.0
    assert events[1]["step"] == 5
