"""Deterministic OSM PBF writer — synthesizes wire-format payloads.

Used to build the Common-Crawl-style ``pages`` table (BASELINE.json
input_hint) at arbitrary scale: each page's ``html`` column carries a valid
OSM PBF byte stream (4B BE framing + BlobHeader + zlib Blob + PrimitiveBlock
with DenseNodes/Ways/Relations, granularity=100, date_granularity=1000 —
same wire format the reference parses, ``lib/proto/*.proto``).

Varint encoding of the packed columns is NumPy-vectorized (byte-matrix
construction, no per-value Python loop) so synthesis scales to millions of
nodes per second.
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = [
    "encode_packed_varints",
    "zigzag_encode",
    "build_dense_nodes_block",
    "build_header_block",
    "build_file",
]

_N_BYTE_SLOTS = 10


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def encode_packed_varints(u: np.ndarray) -> bytes:
    """uint64 array → packed varint bytes, vectorized.

    Builds an (n, 10) byte matrix; byte i of value v is kept iff i == 0 or
    v has bits at position 7i or above. The keep-mask is a per-row prefix,
    so flattening in C order preserves the byte sequence.
    """
    u = u.astype(np.uint64, copy=False)
    if u.size == 0:
        return b""
    n = u.size
    bytes_matrix = np.empty((n, _N_BYTE_SLOTS), dtype=np.uint8)
    keep = np.zeros((n, _N_BYTE_SLOTS), dtype=bool)
    keep[:, 0] = True
    v = u
    for i in range(_N_BYTE_SLOTS):
        bytes_matrix[:, i] = (v & 0x7F).astype(np.uint8)
        v = v >> 7  # python-int shift: numpy-scalar operands hit a slow path
        if i + 1 < _N_BYTE_SLOTS:
            keep[:, i + 1] = v != 0
        if not v.any():
            break
    more = np.zeros_like(keep)
    more[:, :-1] = keep[:, 1:]
    bytes_matrix |= more.astype(np.uint8) << 7
    return bytes_matrix[keep].tobytes()


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def _len_field(field_no: int, payload: bytes) -> bytes:
    return _field(field_no, 2) + _varint(len(payload)) + payload


def _varint_field(field_no: int, value: int) -> bytes:
    return _field(field_no, 0) + _varint(value)


def _packed_signed_field(field_no: int, values: np.ndarray) -> bytes:
    return _len_field(field_no, encode_packed_varints(zigzag_encode(values)))


def _packed_unsigned_field(field_no: int, values: np.ndarray) -> bytes:
    return _len_field(field_no, encode_packed_varints(np.asarray(values, dtype=np.uint64)))


def _string_table(strings: list[str]) -> bytes:
    return b"".join(_len_field(1, s.encode("utf-8")) for s in strings)


def _delta(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    out = np.empty_like(v)
    if v.size:
        out[0] = v[0]
        out[1:] = v[1:] - v[:-1]
    return out


def build_dense_nodes_block(
    ids: np.ndarray,
    lats_deg: np.ndarray,
    lons_deg: np.ndarray,
    *,
    granularity: int = 100,
    date_granularity: int = 1000,
    timestamps_ms: np.ndarray | None = None,
    versions: np.ndarray | None = None,
    changesets: np.ndarray | None = None,
    uids: np.ndarray | None = None,
    users: list[str] | None = None,
    tags: list[dict] | None = None,
    ways: list[dict] | None = None,
    relations: list[dict] | None = None,
) -> bytes:
    """Assemble one PrimitiveBlock (DenseNodes group [+ ways [+ relations]]).

    ``ways``: list of {id, refs: list[int], tags: dict} — emitted in a second
    PrimitiveGroup; ``relations``: {id, members: [(type_str, ref, role)],
    tags: dict} in a third. Coordinates are quantized to the granularity
    grid; callers wanting the exact decoded value should pre-quantize.
    """
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    lat_q = np.round(np.asarray(lats_deg, dtype=np.float64) * 1e9 / granularity).astype(np.int64)
    lon_q = np.round(np.asarray(lons_deg, dtype=np.float64) * 1e9 / granularity).astype(np.int64)

    strings: list[str] = [""]  # index 0 reserved delimiter
    sid: dict[str, int] = {}

    def intern(s: str) -> int:
        if s not in sid:
            sid[s] = len(strings)
            strings.append(s)
        return sid[s]

    # --- dense nodes group ---
    dense = bytearray()
    dense += _packed_signed_field(1, _delta(ids))
    if timestamps_ms is not None:
        di = bytearray()
        if versions is not None:
            di += _packed_unsigned_field(1, np.asarray(versions, dtype=np.int64))
        ts_units = np.asarray(timestamps_ms, dtype=np.int64) // date_granularity
        di += _packed_signed_field(2, _delta(ts_units))
        if changesets is not None:
            di += _packed_signed_field(3, _delta(np.asarray(changesets, dtype=np.int64)))
        if uids is not None:
            di += _packed_signed_field(4, _delta(np.asarray(uids, dtype=np.int64)))
        if users is not None:
            user_sids = np.array([intern(u) for u in users], dtype=np.int64)
            di += _packed_signed_field(5, _delta(user_sids))
        dense += _len_field(5, bytes(di))
    dense += _packed_signed_field(8, _delta(lat_q))
    dense += _packed_signed_field(9, _delta(lon_q))
    if tags is not None and any(tags):
        kv: list[int] = []
        for t in tags:
            for k, v in (t or {}).items():
                kv.append(intern(k))
                kv.append(intern(v))
            kv.append(0)
        dense += _packed_unsigned_field(10, np.array(kv, dtype=np.int64))
    # PrimitiveGroup { dense = field 2 }, wrapped as PrimitiveBlock.primitivegroup (field 2)
    groups = [_len_field(2, _len_field(2, bytes(dense)))]

    # --- ways group ---
    if ways:
        wbufs = bytearray()
        for wy in ways:
            wb = bytearray()
            wb += _varint_field(1, int(wy["id"]))
            wtags = wy.get("tags") or {}
            if wtags:
                wb += _packed_unsigned_field(2, np.array([intern(k) for k in wtags], dtype=np.int64))
                wb += _packed_unsigned_field(3, np.array([intern(v) for v in wtags.values()], dtype=np.int64))
            info = wy.get("info")
            if info:
                wb += _len_field(4, _encode_info(info, intern, date_granularity))
            wb += _packed_signed_field(8, _delta(np.array(wy["refs"], dtype=np.int64)))
            wbufs += _len_field(3, bytes(wb))
        groups.append(_len_field(2, bytes(wbufs)))

    # --- relations group ---
    if relations:
        rbufs = bytearray()
        type_enum = {"node": 0, "way": 1, "relation": 2}
        for rl in relations:
            rb = bytearray()
            rb += _varint_field(1, int(rl["id"]))
            rtags = rl.get("tags") or {}
            if rtags:
                rb += _packed_unsigned_field(2, np.array([intern(k) for k in rtags], dtype=np.int64))
                rb += _packed_unsigned_field(3, np.array([intern(v) for v in rtags.values()], dtype=np.int64))
            info = rl.get("info")
            if info:
                rb += _len_field(4, _encode_info(info, intern, date_granularity))
            members = rl.get("members") or []
            if members:
                rb += _packed_unsigned_field(8, np.array([intern(m[2]) for m in members], dtype=np.int64))
                rb += _packed_signed_field(9, _delta(np.array([m[1] for m in members], dtype=np.int64)))
                rb += _packed_unsigned_field(10, np.array([type_enum[m[0]] for m in members], dtype=np.int64))
            rbufs += _len_field(4, bytes(rb))
        groups.append(_len_field(2, bytes(rbufs)))

    block = bytearray()
    block += _len_field(1, _string_table(strings))
    for g in groups:
        block += g
    if granularity != 100:
        block += _varint_field(17, granularity)
    if date_granularity != 1000:
        block += _varint_field(18, date_granularity)
    return bytes(block)


def _encode_info(info: dict, intern, date_granularity: int) -> bytes:
    b = bytearray()
    if "version" in info:
        b += _varint_field(1, int(info["version"]))
    if "timestamp_ms" in info:
        b += _varint_field(2, int(info["timestamp_ms"]) // date_granularity)
    if "changeset" in info:
        b += _varint_field(3, int(info["changeset"]))
    if "uid" in info:
        b += _varint_field(4, int(info["uid"]))
    if "user" in info:
        b += _varint_field(5, intern(info["user"]))
    return bytes(b)


def build_header_block(writingprogram: str = "osmspark-synth",
                       bbox_deg: tuple[float, float, float, float] | None = None
                       ) -> bytes:
    """HeaderBlock bytes; ``bbox_deg`` = (minlon, maxlon, maxlat, minlat)
    → HeaderBBox field 1 (left/right/top/bottom, zigzag nanodegrees —
    the same wire form decode_header_block reads)."""
    b = bytearray()
    if bbox_deg is not None:
        bb = bytearray()
        for field_no, deg in enumerate(bbox_deg, start=1):
            nano = int(round(deg * 1e9))
            bb += _varint_field(field_no, int(
                zigzag_encode(np.array([nano], dtype=np.int64))[0]))
        b += _len_field(1, bytes(bb))
    b += _len_field(4, b"OsmSchema-V0.6")
    b += _len_field(4, b"DenseNodes")
    b += _len_field(16, writingprogram.encode("utf-8"))
    return bytes(b)


def _file_block(blob_type: str, payload: bytes, compress: bool = True) -> bytes:
    if compress:
        blob = _varint_field(2, len(payload)) + _len_field(3, zlib.compress(payload, 6))
    else:
        # Blob.raw (fileformat.proto field 1) + raw_size — the legal
        # uncompressed form the reference TODO-rejects but we decode.
        blob = _len_field(1, payload) + _varint_field(2, len(payload))
    header = _len_field(1, blob_type.encode("utf-8")) + _varint_field(3, len(blob))
    return len(header).to_bytes(4, "big") + header + blob


def build_file(primitive_blocks: list[bytes],
               writingprogram: str = "osmspark-synth",
               compress: bool = True) -> bytes:
    """Frame a header block + N primitive blocks into a full PBF stream.

    ``compress=False`` emits uncompressed (``Blob.raw``) blobs — same
    payload bytes, no zlib wrapper — for raw-path parity tests."""
    out = bytearray(_file_block("OSMHeader", build_header_block(writingprogram),
                                compress=compress))
    for pb in primitive_blocks:
        out += _file_block("OSMData", pb, compress=compress)
    return bytes(out)


def recode_file_raw(data: bytes) -> bytes:
    """Re-frame an existing PBF stream with every blob uncompressed.

    Inflates each Blob and re-emits it as ``Blob.raw`` with identical
    framing/type — the decoded entity rows must be identical to the
    zlib original's (pinned by test_raw_blob_decodes)."""
    from .decode import inflate_blob, split_file_blocks

    out = bytearray()
    for fb, blob in split_file_blocks(data):
        out += _file_block(fb.type, inflate_blob(blob), compress=False)
    return bytes(out)


def build_plain_nodes_block(
    ids: np.ndarray,
    lats_deg: np.ndarray,
    lons_deg: np.ndarray,
    *,
    granularity: int = 100,
    date_granularity: int = 1000,
    timestamps_ms: np.ndarray | None = None,
    versions: np.ndarray | None = None,
    changesets: np.ndarray | None = None,
    uids: np.ndarray | None = None,
    users: list[str] | None = None,
    tags: list[dict] | None = None,
) -> bytes:
    """PrimitiveBlock whose group carries non-dense ``Node`` messages
    (osmformat.proto: id=1 sint64, keys=2, vals=3, info=4, lat=8,
    lon=9) — the form the reference refuses; used to pin our plain-node
    decode against the dense path on identical logical content."""
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    lat_q = np.round(np.asarray(lats_deg, dtype=np.float64) * 1e9 / granularity).astype(np.int64)
    lon_q = np.round(np.asarray(lons_deg, dtype=np.float64) * 1e9 / granularity).astype(np.int64)

    strings: list[str] = [""]
    sid: dict[str, int] = {}

    def intern(s: str) -> int:
        if s not in sid:
            sid[s] = len(strings)
            strings.append(s)
        return sid[s]

    def _sint_field(field_no: int, value: int) -> bytes:
        return _varint_field(field_no, int(
            zigzag_encode(np.array([value], dtype=np.int64))[0]))

    nbufs = bytearray()
    for i in range(n):
        nb = bytearray()
        nb += _sint_field(1, int(ids[i]))
        t = (tags[i] if tags is not None else None) or {}
        if t:
            nb += _packed_unsigned_field(2, np.array([intern(k) for k in t], dtype=np.int64))
            nb += _packed_unsigned_field(3, np.array([intern(v) for v in t.values()], dtype=np.int64))
        if timestamps_ms is not None:
            info = {"timestamp_ms": int(timestamps_ms[i])}
            if versions is not None:
                info["version"] = int(versions[i])
            if changesets is not None:
                info["changeset"] = int(changesets[i])
            if uids is not None:
                info["uid"] = int(uids[i])
            if users is not None:
                info["user"] = users[i]
            nb += _len_field(4, _encode_info(info, intern, date_granularity))
        nb += _sint_field(8, int(lat_q[i]))
        nb += _sint_field(9, int(lon_q[i]))
        nbufs += _len_field(1, bytes(nb))

    block = bytearray()
    block += _len_field(1, _string_table(strings))
    block += _len_field(2, bytes(nbufs))
    if granularity != 100:
        block += _varint_field(17, granularity)
    if date_granularity != 1000:
        block += _varint_field(18, date_granularity)
    return bytes(block)
