"""redact_pii + bivariate_morans_i: Python re oracle for the redaction
chain, NumPy moment oracle for the cross-Moran, structure pins."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from osmspark.pipeline.textstats import PII_PATTERNS, PII_TOKENS, redact_pii
from osmspark.spatial.autocorr import bivariate_morans_i

DOCS = [
    (0, "plain text no pii at all"),
    (1, "mail bob@example.com and alice.b@sub.example.org twice"),
    (2, "server 10.0.0.1 talked to 192.168.10.255 yesterday"),
    (3, "call +4915112345678 or write x@y.de from 8.8.8.8"),
    (4, "email-in-host case user@1.2.3.4.example.com stays one email"),
    (5, ""),
]


def _py_redact(text: str) -> tuple[int, str]:
    n = sum(len(re.findall(p, text)) for p in PII_PATTERNS.values())
    for name, p in PII_PATTERNS.items():
        text = re.sub(p, PII_TOKENS[name], text)
    return n, text


@pytest.fixture(scope="module")
def redacted(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {int(r.doc_id): (int(r.n_redacted), r.text_redacted)
            for r in redact_pii(df).collect()}


def test_matches_python_re(redacted):
    assert redacted == {i: _py_redact(t) for i, t in DOCS}


def test_email_swallows_inner_ipv4(redacted):
    # doc 4: the address containing a dotted-quad host is replaced as
    # ONE email (the email pattern runs first), but n_redacted is the
    # pre-replacement AUDIT count — the nested quad still counts, the
    # same number with_pii_counts reports
    n, text = redacted[4]
    assert n == 2 and "<EMAIL>" in text and "<IPV4>" not in text


def test_counts_match_audit_columns(spark):
    from osmspark.pipeline.textstats import with_pii_counts
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    joined = (redact_pii(with_pii_counts(df))
              .select("doc_id", "n_redacted",
                      (F.col("n_emails") + F.col("n_ipv4")
                       + F.col("n_phones")).alias("n_audit")).collect())
    assert all(r.n_redacted == r.n_audit for r in joined)


def test_redact_is_map_only(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ---------------------------------------------------------------- bimoran

CELLS = [(x, y, (x * 3 + y * 5) % 7 + 1, (x * 2 + y) % 5 + 10)
         for x in range(5) for y in range(4)]


def _bimoran_oracle():
    n = len(CELLS)
    sx = sum(c[2] for c in CELLS)
    sy = sum(c[3] for c in CELLS)
    dev = {(cx, cy): (n * x - sx, n * y - sy) for cx, cy, x, y in CELLS}
    num = w = 0
    for (ax, ay), (dxi, _) in dev.items():
        for (bx, by), (_, dyj) in dev.items():
            if abs(ax - bx) + abs(ay - by) == 1:
                num += dxi * dyj
                w += 1
    den_x = sum(d[0] * d[0] for d in dev.values())
    den_y = sum(d[1] * d[1] for d in dev.values())
    moran = (n / w) * (num / (den_x ** 0.5 * den_y ** 0.5))
    return n, w, num, den_x, den_y, round(moran, 9)


def test_bimoran_matches_brute(spark):
    df = spark.createDataFrame(CELLS, "cell_x long, cell_y long, "
                                      "x long, y long")
    r = bivariate_morans_i(df).collect()[0]
    n, w, num, dx, dy, m = _bimoran_oracle()
    assert (r.n_cells, r.w_pairs, r.num, r.den_x, r.den_y) \
        == (n, w, num, dx, dy)
    assert r.moran_xy == pytest.approx(m, abs=1e-9)


def test_bimoran_constant_field_null(spark):
    rows = [(x, y, 5, x + y) for x in range(3) for y in range(3)]
    df = spark.createDataFrame(rows, "cell_x long, cell_y long, "
                                     "x long, y long")
    assert bivariate_morans_i(df).collect()[0].moran_xy is None


def test_bimoran_self_is_moran(spark):
    # x == y degenerates to univariate Moran's I
    from osmspark.spatial.autocorr import morans_i
    rows = [(x, y, (x * 3 + y * 5) % 7 + 1) for x in range(5)
            for y in range(4)]
    df = spark.createDataFrame(rows, "cell_x long, cell_y long, n long")
    bi = bivariate_morans_i(
        df.select("cell_x", "cell_y", F.col("n").alias("x"),
                  F.col("n").alias("y"))).collect()[0]
    uni = morans_i(df).collect()[0]
    assert bi.moran_xy == pytest.approx(uni.moran_i, abs=1e-9)


def test_bimoran_no_cartesian(spark):
    df = spark.createDataFrame(CELLS, "cell_x long, cell_y long, "
                                      "x long, y long")
    plan = (bivariate_morans_i(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
