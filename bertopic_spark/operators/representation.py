"""Representation fine-tuners (X6) beyond MMR — the reference's
``KeyBERTInspired`` (`representation/_keybert.py:68-222`) and
``PartOfSpeech`` (`representation/_pos.py:94`) re-expressed Spark-first.

KeyBERT-inspired: re-rank each topic's candidate words by cosine similarity
between the word's embedding and the topic's (score-weighted mean word)
embedding. The reference embeds with a sentence-transformer; this container
has none, so the embedder is a DETERMINISTIC md5-derived hash vector — the
join/aggregation structure (embed candidates → weighted topic vector →
cosine re-rank) is identical and fully oracle-checkable cross-engine (md5
produces identical bytes in Spark and DuckDB). Swap ``_hash_word_vecs`` for
a real mapInPandas encoder (sources/multimodal.extract_features shape) to
get the reference's semantics verbatim.

PartOfSpeech analog: the reference keeps candidate words whose spaCy POS
pattern matches; without spaCy the patterns are plain regexes over the
word (the reference's own pattern list is regex-shaped). Pure JVM
filter + window — no Python.

Everything is long-form (term, dim, val) — no dense vectors, no UDFs; at
scale the joins key on term/class and broadcast the candidate set, which is
top_n × n_classes rows by construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_DIM = 16


def _hash_word_vecs(terms: DataFrame, dim: int = HASH_DIM) -> DataFrame:
    """(term, dim, val) deterministic embedding: val ∈ [−0.5, 0.5) from the
    md5 of ``term_dim`` — bit-identical in DuckDB via
    CAST(conv(substr(md5(term || '_' || d), 1, 8), 16, 10) AS BIGINT)."""
    base = terms.select("term").distinct().select(
        "term", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("dim"))
    h = F.conv(
        F.substring(F.md5(F.concat_ws("_", F.col("term"), F.col("dim"))), 1, 8),
        16, 10,
    ).cast("long")
    return base.withColumn("val", (h % 1000) / F.lit(1000.0) - 0.5)


def keybert_rerank(topk: DataFrame, class_cols: Sequence[str],
                   top_n: int | None = None, dim: int = HASH_DIM) -> DataFrame:
    """(class..., term, kb_score, kb_rank): candidates re-ranked by cosine
    to the topic's score-weighted mean word vector (KeyBERTInspired shape:
    embed → topic vector → cosine re-rank; `_keybert.py:154-222`).

    ``topk`` is top_k_terms output (class..., term, score, rank). Scores
    must be the non-negative default-idf variant (weights of the mean).
    """
    cand = topk.select(*class_cols, "term", "score")
    wv = _hash_word_vecs(cand.select("term"), dim)
    joined = cand.join(wv, "term")
    tv = (
        joined.groupBy(*class_cols, "dim")
        .agg((F.sum(F.col("score") * F.col("val")) / F.sum("score")).alias("tv"))
    )
    tnorm = tv.groupBy(*class_cols).agg(
        F.sqrt(F.sum(F.col("tv") * F.col("tv"))).alias("tnorm"))
    per_term = (
        joined.join(tv, [*class_cols, "dim"])
        .groupBy(*class_cols, "term")
        .agg(F.sum(F.col("val") * F.col("tv")).alias("num"),
             F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("wnorm"))
    )
    scored = per_term.join(tnorm, list(class_cols)).select(
        *class_cols, "term",
        F.round(F.col("num") / (F.col("wnorm") * F.col("tnorm")), 6).alias("kb_score"),
    )
    w = Window.partitionBy(*class_cols).orderBy(F.desc("kb_score"), F.asc("term"))
    out = scored.withColumn("kb_rank", F.row_number().over(w).cast("long"))
    if top_n is not None:
        out = out.filter(F.col("kb_rank") <= top_n)
    return out


def pos_pattern_rerank(topk: DataFrame, class_cols: Sequence[str],
                       patterns: Sequence[str] = (r"^[a-z]{3,}$",),
                       top_n: int | None = None) -> DataFrame:
    """(class..., term, score, pos_rank): keep candidate words matching ANY
    pattern, re-rank survivors by the original (score desc, term asc) —
    the PartOfSpeech fine-tuner with regex patterns standing in for spaCy
    POS matchers (`_pos.py:94-143`)."""
    keep = None
    for p in patterns:
        cond = F.col("term").rlike(p)
        keep = cond if keep is None else (keep | cond)
    filtered = topk.filter(keep)
    w = Window.partitionBy(*class_cols).orderBy(F.desc("score"), F.asc("term"))
    out = filtered.select(*class_cols, "term", "score").withColumn(
        "pos_rank", F.row_number().over(w).cast("long"))
    if top_n is not None:
        out = out.filter(F.col("pos_rank") <= top_n)
    return out
