"""Geoparsing — osmspark/pipeline/geoparse.py."""

from osmspark.pipeline.geoparse import extract_geotags, geotag_tile_counts

SCHEMA = "doc_id long, html_text string"


def _meta(lat, lon):
    return f'<meta name="geo.position" content="{lat};{lon}">'


def test_extract_positions_and_cells(spark):
    docs = [(1, "<html>" + _meta("51.50", "-0.12") + "</html>"),
            (2, "<html>no tags here</html>"),
            (3, _meta("-33.86", "151.20") + "mid" + _meta("0.10", "0.10"))]
    rows = extract_geotags(
        spark.createDataFrame(docs, SCHEMA)).orderBy(
            "doc_id", "tag_pos").collect()
    assert [(r["doc_id"], r["tag_pos"]) for r in rows] == \
        [(1, 0), (3, 0), (3, 1)]
    r0 = rows[0]
    assert r0["lat"] == 51.50 and r0["lon"] == -0.12
    assert (r0["cell_x"], r0["cell_y"]) == (-1, 103)
    assert (rows[1]["cell_x"], rows[1]["cell_y"]) == (302, -68)


def test_malformed_tags_ignored(spark):
    docs = [(1, _meta("51.5", "bad") + _meta("abc", "0.1")
             + '<meta name="geo.position" content="1.5;2.5">')]
    rows = extract_geotags(
        spark.createDataFrame(docs, SCHEMA)).collect()
    assert len(rows) == 1 and rows[0]["lat"] == 1.5


def test_tile_counts_distinct_docs(spark):
    # doc 1 tags cell (0,0) twice -> n_tags 2, n_docs 1
    docs = [(1, _meta("0.10", "0.10") + _meta("0.20", "0.20")),
            (2, _meta("0.30", "0.30")),
            (3, _meta("5.10", "5.10"))]
    rows = {(r["cell_x"], r["cell_y"]): r for r in geotag_tile_counts(
        spark.createDataFrame(docs, SCHEMA)).collect()}
    a = rows[(0, 0)]
    assert a["n_tags"] == 3 and a["n_docs"] == 2
    assert rows[(10, 10)]["n_docs"] == 1


def test_negative_zero_boundary(spark):
    # -0.10 floors to cell -1, +0.10 to cell 0
    docs = [(1, _meta("-0.10", "0.10")), (2, _meta("0.10", "-0.10"))]
    rows = {r["doc_id"]: r for r in extract_geotags(
        spark.createDataFrame(docs, SCHEMA)).collect()}
    assert (rows[1]["cell_x"], rows[1]["cell_y"]) == (0, -1)
    assert (rows[2]["cell_x"], rows[2]["cell_y"]) == (-1, 0)
