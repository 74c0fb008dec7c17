"""URL operators: parts extraction, normalization, host stats."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from osmspark.pipeline.urls import (host_stats, normalized_url_col,
                                    with_url_parts)


def _parts(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return with_url_parts(df).toPandas().set_index("url")


def test_url_parts_basic(spark):
    p = _parts(spark, ["https://WWW.Example.org:8443/a/b/c?x=1&y=2#frag",
                       "http://news.shop.co.uk/",
                       "https://localhost/path"])
    r = p.loc["https://WWW.Example.org:8443/a/b/c?x=1&y=2#frag"]
    assert r["scheme"] == "https" and r["host"] == "www.example.org"
    assert r["port"] == 8443 and r["path"] == "/a/b/c"
    assert r["query"] == "x=1&y=2" and r["fragment"] == "frag"
    assert r["registrable_domain"] == "example.org"
    assert r["path_depth"] == 3
    r2 = p.loc["http://news.shop.co.uk/"]
    assert r2["registrable_domain"] == "shop.co.uk"  # co is second-level
    assert r2["path_depth"] == 0 and pd.isna(r2["port"])
    r3 = p.loc["https://localhost/path"]
    assert r3["registrable_domain"] == "localhost"
    assert r3["path_depth"] == 1


def test_url_parts_null_components(spark):
    p = _parts(spark, ["https://example.org"])
    r = p.iloc[0]
    assert pd.isna(r["query"]) and pd.isna(r["fragment"])
    assert pd.isna(r["port"])
    assert r["path_depth"] == 0


def _norm(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    out = df.select("url", normalized_url_col(F.col("url")).alias("n"))
    return dict(out.collect())


def test_normalize_rules(spark):
    n = _norm(spark, [
        "HTTPS://WWW.Example.org/a/b/",          # case + trailing slash
        "https://example.org:443/x",             # default port stripped
        "http://example.org:8080/x",             # explicit port kept
        "https://example.org/p?utm_source=f&b=2&a=1#frag",  # utm+sort+frag
        "https://example.org/p?utm_only=x",      # query emptied
    ])
    assert n["HTTPS://WWW.Example.org/a/b/"] == "https://www.example.org/a/b"
    assert n["https://example.org:443/x"] == "https://example.org/x"
    assert n["http://example.org:8080/x"] == "http://example.org:8080/x"
    assert (n["https://example.org/p?utm_source=f&b=2&a=1#frag"]
            == "https://example.org/p?a=1&b=2")
    assert n["https://example.org/p?utm_only=x"] == "https://example.org/p"


def test_normalize_idempotent(spark):
    urls = ["https://example.org/p?b=2&a=1",
            "http://A.B.co/x/",
            "https://h.io:9999/q?utm_x=1&k=v#z"]
    once = _norm(spark, urls)
    twice = _norm(spark, list(once.values()))
    for u in urls:
        assert twice[once[u]] == once[u]


def test_host_stats(spark):
    pdf = pd.DataFrame({
        "url": ["https://a.org/1", "https://A.org/2", "https://a.org/3",
                "https://b.org/1", "https://b.org/2"],
        "text": ["same", "same", "diff", "t1", "t2"],
        "lang": ["en", "en", "de", "en", "en"]})
    out = (host_stats(spark.createDataFrame(pdf))
           .toPandas().set_index("host"))
    a = out.loc["a.org"]
    assert a["n_pages"] == 3 and a["n_langs"] == 2
    assert a["n_distinct_texts"] == 2
    assert abs(a["dup_rate"] - 1.0 / 3.0) < 1e-15
    b = out.loc["b.org"]
    assert b["n_pages"] == 2 and b["dup_rate"] == 0.0


# --- link extraction / crawl graph (round 4) ---------------------------

def test_extract_links_resolution_classes(spark):
    from osmspark.pipeline.urls import extract_links
    rows = [(1, "https://a.example.org/p",
             '<a href="https://b.org/x">1</a>'
             '<a href="/rel">2</a>'
             '<a href="HTTP://A.Example.ORG/y">3</a>'
             '<a href="mailto:m@q">4</a>'
             '<a href="foo.html">5</a>')]
    df = spark.createDataFrame(rows, "doc_id long, url string, html_text string")
    got = {r["link"]: r for r in extract_links(df).collect()}
    assert got["https://b.org/x"]["target_host"] == "b.org"
    assert got["https://b.org/x"]["is_internal"] is False
    assert got["/rel"]["target_host"] == "a.example.org"
    assert got["/rel"]["is_internal"] is True
    # case-insensitive scheme + host lowering → internal
    assert got["HTTP://A.Example.ORG/y"]["target_host"] == "a.example.org"
    assert got["HTTP://A.Example.ORG/y"]["is_internal"] is True
    assert got["mailto:m@q"]["target_host"] is None
    assert got["foo.html"]["target_host"] is None


def test_link_graph_counts(spark):
    from osmspark.pipeline.urls import link_graph
    rows = [(1, "https://a.org/1",
             '<a href="https://b.org/x">.</a><a href="https://b.org/y">.</a>'),
            (2, "https://a.org/2", '<a href="/self">.</a>'),
            (3, "https://c.org/3", '<a href="nope.html">.</a>')]
    df = spark.createDataFrame(rows, "doc_id long, url string, html_text string")
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in link_graph(df).collect()}
    assert got == {("a.org", "b.org"): 2, ("a.org", "a.org"): 1}
