"""Golden PBF decode parity — every pinned assertion from the reference's
mocha suite (test/pbfTest.js, test/xmlPbfTest.js, test/manyNodesTest.js),
ported per FIXTURES.md §3. Pure Python (no Spark) — these pin the decoder
itself; the Spark layer is covered in test_spark_decode.py."""

import numpy as np
import pytest

from osmspark.pbf import (
    PbfError,
    decode_header_block,
    decode_primitive_block,
    inflate_blob,
    split_file_blocks,
)


@pytest.fixture(scope="module")
def golden(golden_pbf):
    blocks = split_file_blocks(golden_pbf)
    return blocks, decode_primitive_block(inflate_blob(blocks[1][1]))


def test_block_manifest(golden):
    blocks, _ = golden
    # pbfTest.js:36-40,65-69: 1 OSMHeader + 1 OSMData
    assert [b.type for b, _ in blocks] == ["OSMHeader", "OSMData"]


def test_header(golden, golden_pbf):
    blocks, _ = golden
    hdr = decode_header_block(inflate_blob(blocks[0][1]))
    assert hdr["writingprogram"] == "0.40.1"  # pbfTest.js:60-62
    assert "OsmSchema-V0.6" in hdr["required_features"]
    assert "DenseNodes" in hdr["required_features"]


def test_stringtable_and_granularity(golden):
    _, blk = golden
    assert blk.string_table.entries[2] == "smsm1"  # pbfTest.js:89-91
    assert blk.granularity == 100                   # pbfTest.js:93-95
    assert blk.date_granularity == 1000


def test_three_groups_in_order(golden):
    _, blk = golden
    # pbfTest.js:97-99 + emission order nodes→ways→relations
    assert [g.kind for g in blk.groups] == ["nodes", "ways", "relations"]


def test_node0_pinned(golden):
    _, blk = golden
    g = blk.groups[0].nodes
    assert g["n"] == 6
    assert g["id"][0] == 319408586
    # exact double equality — pbfTest.js:116-118 via the literal formula
    assert g["lat"][0] == 51.5074089
    assert g["lon"][0] == -0.1080108
    assert g["version"][0] == 1
    assert g["timestamp_ms"][0] == 1229476722000  # pbfTest.js:128-130
    assert g["changeset"][0] == 440330
    assert g["uid"][0] == "6871"
    assert g["user"][0] == "smsm1"


def test_node1_pinned(golden):
    _, blk = golden
    g = blk.groups[0].nodes
    assert g["id"][1] == 319408587
    assert g["lat"][1] == 51.5074343
    assert g["lon"][1] == -0.1081264


def test_node2_tags(golden):
    _, blk = golden
    g = blk.groups[0].nodes
    o = g["tag_offsets"]
    tags = dict(zip(g["tag_keys"][o[2]:o[3]], g["tag_vals"][o[2]:o[3]]))
    assert tags == {"name": "Jam's Sandwich Bar", "amenity": "cafe"}


def test_node5_empty_tags_not_null(golden):
    _, blk = golden
    g = blk.groups[0].nodes
    assert g["lat"][5] == 51.507406
    assert g["lon"][5] == -0.1083348
    o = g["tag_offsets"]
    assert o[6] - o[5] == 0  # empty map, not null — pbfTest.js:156-158


def test_way_pinned(golden):
    _, blk = golden
    w = blk.groups[1].ways[0]
    assert w["id"] == 27776903
    assert w["version"] == 3
    assert w["timestamp_ms"] == 1243777155000
    assert w["changeset"] == 1368552
    assert w["user"] == "Matt"
    assert w["uid"] == "70"
    tags = dict(zip(w["tag_keys"], w["tag_vals"]))
    assert tags == {"access": "private", "highway": "service", "name": "üßé€"}
    assert list(w["refs"]) == [304994979, 319408587, 319408586, 304994980, 304994981]


def test_relation_pinned(golden):
    _, blk = golden
    r = blk.groups[2].relations[0]
    assert r["id"] == 56688
    assert r["version"] == 28
    assert r["changeset"] == 6947637
    assert r["user"] == "kmvar"
    tags = dict(zip(r["tag_keys"], r["tag_vals"]))
    assert tags == {"network": "VVW", "ref": "123", "route": "bus", "type": "route"}
    members = list(zip(r["member_types"], r["member_refs"], r["member_roles"]))
    assert members == [("node", 319408586, ""), ("way", 27776903, "")]


def test_many_nodes_3000(many_nodes_pbf):
    blocks = split_file_blocks(many_nodes_pbf)
    total = 0
    for fb, blob in blocks:
        if fb.type != "OSMData":
            continue
        blk = decode_primitive_block(inflate_blob(blob))
        for g in blk.groups:
            if g.kind == "nodes":
                total += g.nodes["n"]
    assert total == 3000  # manyNodesTest.js:30-32


def test_raw_blob_decodes(golden_pbf):
    """Uncompressed (Blob.raw) blobs decode to the exact zlib-path rows.

    The reference rejects raw with 'Uncompressed pbfs are currently not
    supported' (lib/pbfParser.js:604-606) — its TODO, not a semantic:
    raw is legal per lib/proto/fileformat.proto:29-41."""
    from osmspark.pbf.encode import recode_file_raw
    from osmspark.pbf.source import decode_page, render_text

    raw_file = recode_file_raw(golden_pbf)
    assert raw_file != golden_pbf  # actually re-framed
    a = decode_page(golden_pbf)
    b = decode_page(raw_file)
    assert len(a) == len(b)
    assert render_text(a) == render_text(b)
    ga = next(d for _, t, d in a if t == "OSMData")
    gb = next(d for _, t, d in b if t == "OSMData")
    na, nb = ga.groups[0].nodes, gb.groups[0].nodes
    assert list(na["id"]) == list(nb["id"])
    assert list(na["lat"]) == list(nb["lat"])
    assert list(na["tag_vals"]) == list(nb["tag_vals"])


def test_raw_blob_size_mismatch_rejected():
    from osmspark.pbf.encode import _len_field, _varint_field

    blob = _len_field(1, b"\x00" * 10) + _varint_field(2, 99)
    with pytest.raises(PbfError, match="raw size"):
        inflate_blob(blob)


def test_plain_nodes_parity_with_dense():
    """Non-dense Node messages decode to the same columns the dense
    path produces for identical logical content (reference refuses
    plain nodes at lib/pbfParser.js:269-271 — we decode them)."""
    import numpy as np

    from osmspark.pbf.encode import (
        build_dense_nodes_block, build_file, build_plain_nodes_block)

    kw = dict(
        ids=np.array([101, 102, 203], dtype=np.int64),
        lats_deg=np.array([51.5074, -33.8688, 35.6895]),
        lons_deg=np.array([-0.1278, 151.2093, 139.6917]),
        timestamps_ms=np.array([1735689600000, 1735689661000, 1735693200000]),
        versions=np.array([1, 3, 2]),
        changesets=np.array([11, 12, 13]),
        uids=np.array([7, 8, 7]),
        users=["alice", "bob", "alice"],
        tags=[{"name": "poi", "amenity": "cafe"}, {}, {"name": "x"}],
    )
    dense = decode_primitive_block(build_dense_nodes_block(**kw))
    plain = decode_primitive_block(build_plain_nodes_block(**kw))
    gd, gp = dense.groups[0].nodes, plain.groups[0].nodes
    assert gp["n"] == gd["n"] == 3
    for col in ("id", "lat", "lon", "tag_offsets", "tag_keys", "tag_vals"):
        assert list(gp[col]) == list(gd[col]), col
    for col in ("version", "timestamp_ms", "changeset", "uid", "user"):
        assert list(gp[col]) == list(gd[col]), col
    # negative-coordinate zigzag and framing also survive a file round trip
    from osmspark.pbf.source import decode_page
    blocks = decode_page(build_file([build_plain_nodes_block(**kw)]))
    assert blocks[1][2].groups[0].nodes["n"] == 3


def test_plain_nodes_without_info():
    import numpy as np

    from osmspark.pbf.encode import build_plain_nodes_block

    blk = decode_primitive_block(build_plain_nodes_block(
        ids=np.array([5], dtype=np.int64),
        lats_deg=np.array([0.5]), lons_deg=np.array([-0.5])))
    g = blk.groups[0].nodes
    assert g["version"] is None and g["user"] is None
    assert g["lat"][0] == 0.5 and g["lon"][0] == -0.5


def test_oversize_element_rejected():
    from osmspark.pbf.encode import _len_field, _varint_field

    header = _len_field(1, b"OSMData") + _varint_field(3, 33 * 1024 * 1024)
    data = len(header).to_bytes(4, "big") + header
    with pytest.raises(PbfError, match="maximum size"):
        split_file_blocks(data)


def test_truncated_file_rejected(golden_pbf):
    with pytest.raises(PbfError):
        split_file_blocks(golden_pbf[:-10])
