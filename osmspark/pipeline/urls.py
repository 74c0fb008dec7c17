"""URL operators for Common-Crawl-style page tables.

The engine's page tables carry a ``url`` column (the input-table
contract: url, warc_ts, html, text, lang). These are the standard
corpus-curation URL primitives — all pure JVM expressions (parse_url
is a Spark built-in; the rest is split/filter/sort array codegen), no
Python in the row path:

- :func:`with_url_parts` — scheme/host/port/path/query/fragment
  projection + registrable-domain heuristic + path depth.
- :func:`normalized_url_col` — canonical URL for exact URL-dedup:
  lowercase scheme+host, strip fragment, strip default ports, strip
  trailing path slash, drop ``utm_*`` tracking params, sort the
  remaining query params (order-insensitive crawlers emit either
  order).
- :func:`host_stats` — per-host page count, distinct languages and
  exact-duplicate-text rate: the crawl-health table that decides which
  hosts need boilerplate removal or get capped in sampling.

The registrable-domain column uses a SMALL inline public-suffix rule
(two labels, three when the second-to-last is a known second-level
registry label like ``co``/``com``/``ac``/…): the full Mozilla PSL is
a data file, not an algorithm — swap ``_SECOND_LEVEL`` for the real
list in production. Documented simplification, exercised as such in
tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["with_url_parts", "normalized_url_col", "host_stats",
           "extract_links", "link_graph"]

#: second-to-last labels under which registration happens one level
#: deeper (co.uk, com.au, ac.jp, …) — heuristic stand-in for the PSL
_SECOND_LEVEL = ["co", "com", "net", "org", "ac", "gov", "edu"]


def _registrable_domain(host: Column) -> Column:
    """Last two host labels, or three when label -2 is a second-level
    registry label (and at least three labels exist)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    take3 = (n >= 3) & second.isin(*_SECOND_LEVEL)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2),
                        F.element_at(parts, -1))
    return F.when(n <= 1, host).otherwise(F.when(take3, last3)
                                          .otherwise(last2))


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add scheme/host/port/path/query/fragment/registrable_domain/
    path_depth columns (nulls where the component is absent).

    ``host`` and ``scheme`` are lowercased (case-insensitive per RFC
    3986); ``port`` is the explicit port only (null when the URL has
    none). ``path_depth`` counts non-empty path segments."""
    u = F.col(url_col)
    auth = F.parse_url(u, F.lit("AUTHORITY"))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    port = F.when(auth.contains(":"),
                  F.split(auth, ":").getItem(1).cast("int"))
    path = F.parse_url(u, F.lit("PATH"))
    return (df
            .withColumn("scheme", F.lower(F.parse_url(u, F.lit("PROTOCOL"))))
            .withColumn("host", host)
            .withColumn("port", port)
            .withColumn("path", path)
            .withColumn("query", F.parse_url(u, F.lit("QUERY")))
            .withColumn("fragment", F.parse_url(u, F.lit("REF")))
            .withColumn("registrable_domain", _registrable_domain(host))
            .withColumn("path_depth",
                        F.size(F.filter(F.split(F.coalesce(path, F.lit("")),
                                                "/"),
                                        lambda s: s != F.lit("")))))


def normalized_url_col(url: Column) -> Column:
    """Canonical URL string for exact URL-level dedup.

    Rules (each line is one array/string expression, all codegen):
    scheme+host lowercase; default ports (http:80, https:443) and the
    fragment dropped, explicit non-default ports kept; trailing path
    slashes stripped; ``utm_*`` params dropped; surviving query params
    sorted bytewise; an emptied query loses its ``?``."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    auth = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.when(auth.contains(":"),
                  F.split(auth, ":").getItem(1).cast("int"))
    is_default = ((scheme == "http") & (port == 80)) | \
                 ((scheme == "https") & (port == 443))
    port_part = F.when(port.isNotNull() & ~is_default,
                       F.concat(F.lit(":"), port.cast("string"))) \
        .otherwise(F.lit(""))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, "/+$", "")
    q = F.parse_url(url, F.lit("QUERY"))
    params = F.array_sort(F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda p: (p != F.lit("")) & ~p.startswith("utm_")))
    q_part = F.when(F.size(params) > 0,
                    F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def host_stats(pages: DataFrame, url_col: str = "url",
               text_col: str = "text") -> DataFrame:
    """Per-host crawl-health stats: (host, n_pages, n_langs,
    n_distinct_texts, dup_rate).

    ``dup_rate = 1 - distinct/total`` over the xxhash64 of the text —
    the exact-dup pressure of the host (template/boilerplate sites
    score high and get capped or line-deduped downstream). One
    map-side-combinable aggregation; at crawl scale hosts are the
    natural skew key — a mega-host's partial aggregates still combine
    per task before the shuffle."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    g = (pages
         .select(host.alias("host"), F.col("lang"),
                 F.xxhash64(F.col(text_col)).alias("_th"))
         .groupBy("host")
         .agg(F.count(F.lit(1)).alias("n_pages"),
              F.countDistinct("lang").alias("n_langs"),
              F.countDistinct("_th").alias("n_distinct_texts")))
    return g.withColumn(
        "dup_rate",
        (F.col("n_pages") - F.col("n_distinct_texts")).cast("double")
        / F.col("n_pages"))


def extract_links(pages: DataFrame, html_col: str = "html_text",
                  url_col: str = "url") -> DataFrame:
    """Outgoing links per page from double-quoted ``href`` attributes —
    the crawl-graph extraction step (the input that :mod:`osmspark.
    graph.pagerank` ranks).

    Resolution rules (documented subset of RFC 3986 reference
    resolution — the three shapes a crawler actually stores):

    - absolute ``http(s)://…`` → target host parsed from the link;
    - root-relative ``/path`` → the page's own host;
    - anything else (relative path, fragment, mailto:, javascript:)
      → NULL target host, kept as a row so link audits see them.

    Output: (url, link, target_host, is_internal). Pure JVM:
    ``regexp_extract_all`` + explode + ``parse_url`` — one narrow pass,
    no shuffle; hosts lowercased (case-insensitive per RFC).
    """
    links = F.expr(
        f"regexp_extract_all({html_col}, 'href=\"([^\"]*)\"', 1)")
    page_host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    link = F.col("link")
    is_abs = link.rlike("(?i)^https?://")  # scheme is case-insensitive
    target = F.when(is_abs, F.lower(F.parse_url(link, F.lit("HOST")))) \
        .when(link.startswith("/"), F.col("_page_host")) \
        .otherwise(F.lit(None).cast("string"))
    return (pages
            .select(F.col(url_col).alias("url"),
                    page_host.alias("_page_host"),
                    F.explode(links).alias("link"))
            .withColumn("target_host", target)
            .withColumn("is_internal",
                        F.when(F.col("target_host").isNull(),
                               F.lit(None).cast("boolean"))
                        .otherwise(F.col("target_host")
                                   == F.col("_page_host")))
            .drop("_page_host"))


def link_graph(pages: DataFrame, html_col: str = "html_text",
               url_col: str = "url") -> DataFrame:
    """Host-level crawl graph: (src_host, dst_host, n_links) over the
    resolvable external+internal links. One combinable groupBy on the
    host pair — the edge list :func:`osmspark.graph.pagerank_mass`
    consumes. Mega-host skew is a partial-agg hot key, not a window."""
    l = extract_links(pages, html_col=html_col, url_col=url_col)
    src = F.lower(F.parse_url(F.col("url"), F.lit("HOST")))
    return (l.filter(F.col("target_host").isNotNull())
            .groupBy(src.alias("src_host"),
                     F.col("target_host").alias("dst_host"))
            .agg(F.count(F.lit(1)).alias("n_links")))
