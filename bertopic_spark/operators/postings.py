"""Posting construction: documents → (keys..., term, tf) long-form counts.

This is the engine's equivalent of the reference's CountVectorizer fit
(``bertopic/_bertopic.py:4419-4424``) — but instead of concatenating all
docs of a class into one mega-document (``_bertopic.py:4203``) and counting
single-node, we tokenize per document and let Spark's two-phase hash
aggregation sum counts per (class, term). Algebraically identical; the
partial-aggregation phase IS the SPIMI in-memory posting build, the final
phase the merge.

Skew note (north rule): stop terms concentrate mass on a few term keys.
``groupBy`` aggregation is safe — partial (map-side) aggregation collapses
each heavy key to ≤ n_partitions rows before the shuffle, so no salting is
needed for *counting*. Salting matters where a heavy key's rows must be
physically co-located un-aggregated (posting-segment sort, block encode) —
handled in ``index/segments.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bertopic_spark.tokenizer import with_tokens


def doc_term_counts(
    df: DataFrame,
    text_col: str,
    key_cols: Sequence[str],
    mode: str = "ascii_code",
    ngram_range: tuple[int, int] = (1, 1),
    use_udf: bool | None = None,
    with_len: bool = False,
) -> DataFrame:
    """Per-document term frequencies: (key_cols..., term, tf:long).

    Documents with zero tokens produce no rows (matches sparse semantics:
    an all-zero row never exists in long form).

    with_len=True additionally carries ``doc_len`` (total tokens in the
    document) computed narrowly from the token array — this is what lets
    doc-level BM25 L1-normalize without a second shuffle/join against a
    per-doc length table (unbroadcastable at 10^12 docs).
    """
    toks = with_tokens(df.select(*key_cols, text_col), text_col, mode, ngram_range, use_udf)
    if not with_len:
        return (
            toks.select(*key_cols, F.explode("tokens").alias("term"))
            .groupBy(*key_cols, "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    toks = toks.withColumn("doc_len", F.size("tokens").cast("long"))
    return (
        toks.select(*key_cols, "doc_len", F.explode("tokens").alias("term"))
        .groupBy(*key_cols, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("doc_len").alias("doc_len"))
    )


def class_term_counts(doc_terms: DataFrame, class_cols: Sequence[str]) -> DataFrame:
    """Fold doc-level counts up to class level: the class×term matrix X."""
    return doc_terms.groupBy(*class_cols, "term").agg(F.sum("tf").alias("tf"))
