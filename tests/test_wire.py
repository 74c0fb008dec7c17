"""Unit tests for the hand-rolled protobuf wire codec (no Spark)."""

import numpy as np
import pytest

from osmspark.pbf.encode import encode_packed_varints, zigzag_encode
from osmspark.pbf.wire import (
    decode_packed_sint64,
    decode_packed_varints,
    iter_fields,
    read_varint,
    zigzag_decode,
)


def test_varint_roundtrip_extremes():
    v = np.array(
        [0, 1, -1, 2, -2, 127, 128, -128, 2**31, -(2**31), 2**62, -(2**62),
         np.iinfo(np.int64).max, np.iinfo(np.int64).min],
        dtype=np.int64,
    )
    enc = encode_packed_varints(zigzag_encode(v))
    assert np.array_equal(decode_packed_sint64(enc), v)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    for scale in (2**7, 2**20, 2**40, 2**62):
        v = rng.integers(-scale, scale, 5000).astype(np.int64)
        enc = encode_packed_varints(zigzag_encode(v))
        assert np.array_equal(decode_packed_sint64(enc), v)


def test_zigzag_identity():
    v = np.array([-3, -2, -1, 0, 1, 2, 3], dtype=np.int64)
    assert np.array_equal(zigzag_decode(zigzag_encode(v)), v)
    # published zigzag mapping: 0→0, -1→1, 1→2, -2→3, 2→4
    assert list(zigzag_encode(np.array([0, -1, 1, -2, 2]))) == [0, 1, 2, 3, 4]


def test_truncated_packed_raises():
    with pytest.raises(ValueError):
        decode_packed_varints(b"\x80\x80")  # continuation bit never cleared


def test_read_varint_scalar():
    assert read_varint(b"\x00", 0) == (0, 1)
    assert read_varint(b"\xac\x02", 0) == (300, 2)


def test_iter_fields_mixed():
    # field 1 varint=5, field 2 bytes='abc'
    buf = b"\x08\x05\x12\x03abc"
    fields = [(f, w, bytes(v) if w == 2 else v) for f, w, v in iter_fields(buf)]
    assert fields == [(1, 0, 5), (2, 2, b"abc")]


def test_empty_packed():
    assert decode_packed_varints(b"").size == 0
    assert encode_packed_varints(np.empty(0, dtype=np.uint64)) == b""
