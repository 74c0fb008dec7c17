"""Inverted-index construction over a document corpus.

The retrieval-side artifact a curation pipeline materializes next to
the corpus: per term, document frequency and (for discriminative
terms) the posting list. Pure JVM expressions end to end.

Skew design — the reason this is NOT ``collect_list`` over everything:
at 10^12 documents a stopword's posting list is 10^11 entries; any
formulation that materializes it (collect_list, or a row_number window
partitioned by term) puts that list in one task. Here posting lists
are materialized ONLY for terms with ``df ≤ max_df``: the df census is
a map-side-combinable count first, and the bounded terms' postings are
then collected with a guaranteed per-key bound of ``max_df`` entries.
Hot terms (df > max_df) still get their exact df row with a NULL
posting string — they are stopwords by definition and carry no
retrieval signal; real engines shard exactly this way (posting-list
truncation / stopword elision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["inverted_index"]


def inverted_index(docs: DataFrame, max_df: int,
                   text_col: str = "text",
                   doc_id: str = "doc_id") -> DataFrame:
    """(term, df, postings) — postings a comma-joined ascending doc-id
    string when df ≤ max_df, NULL otherwise.

    Tokenizer: lowercased whitespace split (the corpus-wide tokenizer
    of textstats.py). Two shuffles: the distinct (term, doc) dedup and
    the term census; the postings collection reuses the census
    partitioning (same key).
    """
    pairs = (docs.select(
        F.col(doc_id).alias("d"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), " +"))
        .alias("term"))
        .filter(F.col("term") != "")
        .distinct())
    census = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    bounded = (pairs.join(census.filter(F.col("df") <= max_df)
                          .select("term"), "term")
               .groupBy("term")
               .agg(F.concat_ws(",", F.sort_array(F.collect_list("d")))
                    .alias("postings")))
    return (census.join(bounded, "term", "left")
            .select("term", "df", "postings"))
