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


def test_ways_batch_decode_matches_per_way():
    """The batched ways-group decode (one packed-varint pass per field
    across the whole group) must equal the per-way reference decode —
    including the unpacked-repeated slow path and multi-chunk packed
    fields that a batcher could mis-split."""
    import zlib

    from osmspark.pbf.decode import (
        StringTable, _decode_way, _decode_ways_batch)
    from osmspark.pbf.encode import (
        _len_field, _packed_signed_field, _packed_unsigned_field,
        _varint_field, zigzag_encode)

    strings = ["", "highway", "residential", "name", "Main St"]
    st = StringTable(np.array(strings, dtype=object))

    def way(wid, refs, tag_ids, unpacked=False, split=False):
        b = bytearray(_varint_field(1, wid))
        keys = np.array([t[0] for t in tag_ids], dtype=np.int64)
        vals = np.array([t[1] for t in tag_ids], dtype=np.int64)
        if len(keys):
            b += _packed_unsigned_field(2, keys)
            b += _packed_unsigned_field(3, vals)
        deltas = np.diff(np.concatenate([[0], refs])).astype(np.int64)
        if unpacked:
            for d in deltas:
                b += _varint_field(8, int(zigzag_encode(
                    np.array([d], dtype=np.int64))[0]))
        elif split and len(deltas) > 1:
            b += _packed_signed_field(8, deltas[:1])
            b += _packed_signed_field(8, deltas[1:])
        else:
            b += _packed_signed_field(8, deltas)
        return bytes(b)

    bufs = [
        way(1, np.array([10, 12, 9]), [(1, 2)]),
        way(2, np.array([100]), [(1, 2), (3, 4)]),
        way(3, np.array([5, 6, 7, 8]), [], unpacked=True),   # slow path
        way(4, np.array([-3, 20, 19]), [(3, 4)], split=True),  # 2 chunks
        way(5, np.array([], dtype=np.int64), []),             # no refs
    ]
    got = _decode_ways_batch(bufs, st, 1000)
    want = [_decode_way(b, st, 1000) for b in bufs]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["id"] == w["id"]
        assert np.array_equal(np.asarray(g["refs"]), np.asarray(w["refs"]))
        assert list(g["tag_keys"]) == list(w["tag_keys"])
        assert list(g["tag_vals"]) == list(w["tag_vals"])


def test_relations_batch_decode_matches_per_relation():
    """Batched relations decode == per-relation reference decode,
    including the unpacked slow path and multi-chunk packed members."""
    import numpy as np

    from osmspark.pbf.decode import (
        StringTable, _decode_relation, _decode_relations_batch)
    from osmspark.pbf.encode import (
        _len_field, _packed_signed_field, _packed_unsigned_field,
        _varint_field, zigzag_encode)

    strings = ["", "route", "bus", "stop", "platform", ""]
    st = StringTable(np.array(strings, dtype=object))

    def rel(rid, members, tag_ids, unpacked=False, split=False):
        # members: list of (type_id 0|1|2, ref, role_sid)
        b = bytearray(_varint_field(1, rid))
        keys = np.array([t[0] for t in tag_ids], dtype=np.int64)
        vals = np.array([t[1] for t in tag_ids], dtype=np.int64)
        if len(keys):
            b += _packed_unsigned_field(2, keys)
            b += _packed_unsigned_field(3, vals)
        roles = np.array([m[2] for m in members], dtype=np.int64)
        refs = np.array([m[1] for m in members], dtype=np.int64)
        types = np.array([m[0] for m in members], dtype=np.int64)
        deltas = np.diff(np.concatenate([[0], refs])).astype(np.int64)
        if len(members):
            b += _packed_unsigned_field(8, roles)
            if unpacked:
                for d in deltas:
                    b += _varint_field(9, int(zigzag_encode(
                        np.array([d], dtype=np.int64))[0]))
            elif split and len(deltas) > 1:
                b += _packed_signed_field(9, deltas[:1])
                b += _packed_signed_field(9, deltas[1:])
            else:
                b += _packed_signed_field(9, deltas)
            b += _packed_unsigned_field(10, types)
        return bytes(b)

    bufs = [
        rel(1, [(0, 100, 3), (1, 200, 4)], [(1, 2)]),
        rel(2, [(2, 50, 3)], []),
        rel(3, [(0, 7, 4), (1, 8, 3), (2, 9, 4)], [(1, 2)], unpacked=True),
        rel(4, [(1, -5, 3), (0, 30, 4)], [], split=True),
        rel(5, [], []),  # no members
    ]
    got = _decode_relations_batch(bufs, st, 1000)
    want = [_decode_relation(b, st, 1000) for b in bufs]
    for g, w in zip(got, want):
        assert g["id"] == w["id"]
        assert np.array_equal(np.asarray(g["member_refs"]),
                              np.asarray(w["member_refs"]))
        assert list(g["member_roles"]) == list(w["member_roles"])
        assert list(g["member_types"]) == list(w["member_types"])
        assert list(g["tag_keys"]) == list(w["tag_keys"])
        assert list(g["tag_vals"]) == list(w["tag_vals"])
