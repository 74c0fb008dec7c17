"""Line-level (paragraph) corpus deduplication — CCNet-style boilerplate
removal for web-text training data.

The reference engine (marook/osm-read) stops at entity decode; this module
covers the consumer-side text pipeline the graft adds: split every document
into lines, count identical normalized lines ACROSS the whole corpus, drop
the repeated ones (cookie banners, nav bars, license footers) while keeping
exactly one canonical occurrence, and reassemble the cleaned documents.

Scale design (the part that matters at 100 TB):

* The duplicate census is a ``groupBy(line_hash).agg(count, min(struct))``
  — NOT a ``row_number`` window. A boilerplate line that appears in 1e9
  documents would put 1e9 rows into one window partition (unbounded skew);
  the aggregate form partial-aggregates per map task (map-side combine),
  so the hottest key reduces to one row per task before the shuffle.
* The keeper of a duplicated line is the lexicographically smallest
  ``(doc_id, line_no)`` occurrence — deterministic under any partitioning,
  and expressible as ``min(struct(doc_id, line_no))`` which combines
  associatively.
* Survivor filtering is an equi-join on ``line_hash`` between the exploded
  lines and the census. Both sides hash-partition on the same key, and the
  census side only has one row per DISTINCT line, so the join never
  amplifies the hot key.
* Document reassembly is ``groupBy(doc_id)`` + ``array_sort(collect_list(
  struct(line_no, line)))`` — line order is restored by sort key, not by
  assuming shuffle order.

Everything is pure ``pyspark.sql.functions`` (JVM codegen, no Python), so
the whole pipeline has a line-for-line ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["explode_lines", "line_census", "line_dedup_lines",
           "line_dedup_docs"]


def explode_lines(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", delim: str = "\n") -> DataFrame:
    """``(doc_id, line_no, line)`` — one row per non-empty trimmed line.

    ``line_no`` is the 0-based position of the line in its document (empty
    lines still advance it, so reassembly preserves relative order even
    when blanks are dropped).
    """
    parts = F.split(F.col(text_col), F.lit(delim), -1)
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(parts).alias("line_no", "line"))
            .withColumn("line", F.trim(F.col("line")))
            .filter(F.col("line") != ""))


def line_census(lines: DataFrame) -> DataFrame:
    """Per distinct line: global copy count + the keeper occurrence.

    One map-side-combinable aggregate — see the module docstring for why
    this is the skew-safe shape (a window over ``line_hash`` is not).
    """
    return (lines
            .groupBy(F.md5(F.col("line")).alias("line_hash"))
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min(F.struct("doc_id", "line_no")).alias("keeper")))


def line_dedup_lines(lines: DataFrame, min_dup: int = 2) -> DataFrame:
    """Tag every line with its global copy count and survivor flag.

    A line is kept iff it is NOT boilerplate (``n_copies < min_dup``) or
    it is the canonical keeper occurrence of its duplicate class.
    """
    census = line_census(lines)
    tagged = (lines
              .withColumn("line_hash", F.md5(F.col("line")))
              .join(census, "line_hash"))
    is_keeper = ((F.col("keeper.doc_id") == F.col("doc_id")) &
                 (F.col("keeper.line_no") == F.col("line_no")))
    return (tagged
            .withColumn("keep", (F.col("n_copies") < F.lit(min_dup)) |
                        is_keeper)
            .select("doc_id", "line_no", "line", "n_copies", "keep"))


def line_dedup_docs(lines: DataFrame, min_dup: int = 2,
                    delim: str = "\n") -> DataFrame:
    """Reassembled documents after line-level dedup.

    Returns ``(doc_id, n_lines, n_kept, clean_text)`` where ``clean_text``
    joins the surviving lines in original order. Documents whose every
    line was boilerplate still appear (``n_kept = 0``, empty text) — the
    never-drop contract, so downstream can count fully-boilerplate docs.
    """
    tagged = line_dedup_lines(lines, min_dup=min_dup)
    kept_structs = F.array_sort(F.collect_list(
        F.when(F.col("keep"), F.struct("line_no", "line"))))
    return (tagged
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("keep").cast("long")).alias("n_kept"),
                 kept_structs.alias("_kept"))
            .withColumn("clean_text", F.concat_ws(
                delim, F.transform(F.col("_kept"), lambda s: s["line"])))
            .drop("_kept"))
