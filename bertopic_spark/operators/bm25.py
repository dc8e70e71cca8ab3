"""Doc-level BM25 retrieval — the exhaustive (oracle) query path.

Each document is its own class: the degenerate case of the c-TF-IDF math
(``_ctfidf.py:54-115``) with bm25_weighting. score(q, d) = Σ over the
query's distinct terms of the doc's term score; top-k by (score desc,
doc_id asc) — the deterministic tie-break that makes rank-identity survive
float summation-order jitter across cluster sizes.

Physical shape (SURVEY §3.2): the query set is small → broadcast the
tokenized query terms onto the postings (an inverted-index probe: only
postings of matching terms survive the join), then one groupBy(query, doc)
shuffle whose cardinality is |matching postings|, then a per-query window
top-k. No cross join, no dense matrix. The block-max WAND path
(index/wand.py) must be rank-identical to this.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.operators.ctfidf import ctfidf, term_stats
from bertopic_spark.operators.postings import doc_term_counts


def doc_scores(
    corpus: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "ascii_code",
    bm25_weighting: bool = True,
    reduce_frequent_words: bool = False,
    persist_counts: bool = True,
    _persisted_out: list | None = None,
    combine: str = "shuffle",
) -> DataFrame:
    """The scored doc-level index: (doc_id, term, tf, score).

    ``combine`` is passed through to ``doc_term_counts``: "shuffle"
    (default, fastest single-box) vs "local" (zero-shuffle counting for
    network-bound clusters — see postings.doc_term_counts).

    The count relation feeds three consumers (idf stats, avg length, the
    scored join); their column pruning differs, so Catalyst's ReuseExchange
    can't dedupe them and tokenization would run 3×. Persisting the counts
    (``persist_counts``) makes the build a single tokenize pass — ~3×
    faster. The checkpointed IndexBuild path gets the same effect by
    materializing the postings stage to parquet. Callers running many
    builds in one session can collect the persisted handle via
    ``_persisted_out`` and unpersist after materializing.
    """
    x = doc_term_counts(corpus, text_col, [id_col], mode, with_len=True,
                        combine=combine)
    x = x.withColumnRenamed("doc_len", "class_len")
    if persist_counts:
        x = x.persist()
        if _persisted_out is not None:
            _persisted_out.append(x)
    return ctfidf(
        x, [id_col],
        bm25_weighting=bm25_weighting,
        reduce_frequent_words=reduce_frequent_words,
    )


def queries_df(spark, queries: Mapping[int, str]) -> DataFrame:
    return spark.createDataFrame(
        [(int(k), v) for k, v in sorted(queries.items())],
        "query_id long, query_text string",
    )


def query_terms(qdf: DataFrame, mode: str = "ascii_code") -> DataFrame:
    """Distinct (query_id, term) — unweighted query bag (set semantics)."""
    from bertopic_spark.tokenizer import with_tokens

    return (
        with_tokens(qdf, "query_text", mode)
        .select("query_id", F.explode("tokens").alias("term"))
        .distinct()
    )


def bm25_topk_adhoc(
    corpus: DataFrame,
    qterms: DataFrame,
    k: int = 10,
    text_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "ascii_code",
    bm25_weighting: bool = True,
    reduce_frequent_words: bool = False,
    persist_counts: bool = True,
    _persisted_out: list | None = None,
) -> DataFrame:
    """Ad-hoc retrieval without a prebuilt index: identical results to
    ``bm25_topk(doc_scores(corpus), qterms)`` but the postings are
    SEMI-JOINED to the query's terms BEFORE the idf join and scoring, so
    the scored relation shrinks from |all postings| to |postings of query
    terms| (~100× at typical query widths). Global statistics still see
    every posting (term_stats is one partial-agg pass over the counts —
    that pass is irreducible: idf and avg length are corpus-wide).

    Catalyst will not reorder the two broadcast joins on its own (no CBO);
    the early filter is the explicit push-down.

    Cache lifetime: the counts relation feeds both term_stats and the
    scored join, so it is persisted (``persist_counts``). Long-lived
    sessions serving many ad-hoc batches should either pass
    ``persist_counts=False`` or pass a list as ``_persisted_out`` and
    ``unpersist()`` its entries once the returned plan is materialized —
    otherwise each call pins another copy in executor storage.
    """
    x = doc_term_counts(corpus, text_col, [id_col], mode, with_len=True)
    x = x.withColumnRenamed("doc_len", "class_len")
    if persist_counts:
        x = x.persist()
        if _persisted_out is not None:
            _persisted_out.append(x)
    stats = term_stats(x, [id_col], bm25_weighting=bm25_weighting)
    terms_only = qterms.select("term").distinct()
    xq = x.join(F.broadcast(terms_only), "term")
    scores = ctfidf(
        xq, [id_col],
        bm25_weighting=bm25_weighting,
        reduce_frequent_words=reduce_frequent_words,
        stats=stats.join(F.broadcast(terms_only), "term"),
    )
    return bm25_topk(scores, qterms, k, id_col)


def bm25_topk(
    scores: DataFrame,
    qterms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, score, rank) — exhaustive top-k retrieval."""
    hits = (
        scores.join(F.broadcast(qterms), "term")
        .groupBy("query_id", id_col)
        .agg(F.sum("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def more_like_this(
    corpus: DataFrame,
    seed_ids,
    n_terms: int = 5,
    k: int = 10,
    text_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "ascii_code",
    bm25_weighting: bool = True,
    reduce_frequent_words: bool = False,
    persist_counts: bool = True,
    _persisted_out: list | None = None,
) -> DataFrame:
    """More-like-this: (query_id = seed doc, doc_id, score, rank).

    Lucene MoreLikeThis shape: each seed document's top ``n_terms`` terms by
    its own per-doc score become its query; retrieval is then the standard
    inverted-index probe with the self-hit excluded. One counts pass feeds
    the corpus statistics, the seed-term extraction, AND the probe (hence
    ``persist_counts``); the seed slice is an ``isin`` filter (partition-
    prunable on a materialized index) and its top-n window runs over
    |seeds| × |seed vocab| rows, never the corpus. Ties in term selection
    break on term asc, in ranking on doc_id asc — rank-deterministic across
    partitionings and engines.
    """
    seeds = sorted(set(seed_ids))
    if not seeds:
        raise ValueError("need at least one seed doc id")
    if n_terms < 1 or k < 1:
        raise ValueError("n_terms and k must be >= 1")
    x = doc_term_counts(corpus, text_col, [id_col], mode, with_len=True)
    x = x.withColumnRenamed("doc_len", "class_len")
    if persist_counts:
        x = x.persist()
        if _persisted_out is not None:
            _persisted_out.append(x)
    stats = term_stats(x, [id_col], bm25_weighting=bm25_weighting)

    seed_scores = ctfidf(
        x.filter(F.col(id_col).isin(seeds)), [id_col],
        bm25_weighting=bm25_weighting,
        reduce_frequent_words=reduce_frequent_words, stats=stats)
    wq = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    qterms = (seed_scores.withColumn("tr", F.row_number().over(wq))
              .filter(F.col("tr") <= n_terms)
              .select(F.col(id_col).alias("query_id"), "term"))

    terms_only = qterms.select("term").distinct()
    xq = x.join(F.broadcast(terms_only), "term")
    scores = ctfidf(
        xq, [id_col], bm25_weighting=bm25_weighting,
        reduce_frequent_words=reduce_frequent_words,
        stats=stats.join(F.broadcast(terms_only), "term"))
    hits = (scores.join(F.broadcast(qterms), "term")
            .filter(F.col("query_id") != F.col(id_col))
            .groupBy("query_id", id_col)
            .agg(F.sum("score").alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (hits.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "score", "rank"))


def rrf_fuse(rankings, k0: int = 60, k: int = 10,
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion across retrieval legs:
    (query_id, id, score, rank), score = Σ_legs 1 / (k0 + rank_leg).

    Hybrid lexical+dense retrieval without score calibration — RRF uses
    only ranks (Cormack et al., SIGIR 2009), so a BM25 leg and a cosine
    leg fuse directly. Each leg needs (query_id, id, rank) with rank 1-
    based. Physical shape: the legs are already top-k relations, so the
    union + groupBy shuffles |legs|·k rows per query — negligible next to
    retrieval itself.
    """
    from functools import reduce as _reduce

    legs = list(rankings)
    if not legs:
        raise ValueError("need at least one ranking leg")
    if k0 < 0 or k < 1:
        raise ValueError("k0 must be >= 0 and k >= 1")
    norm = [r.select("query_id", F.col(id_col),
                     (F.lit(1.0) / (F.lit(k0) + F.col("rank"))).alias("c"))
            for r in legs]
    hits = (_reduce(DataFrame.unionByName, norm)
            .groupBy("query_id", id_col).agg(F.sum("c").alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (hits.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "score", "rank"))
