"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL.

Each entry maps a name → (spark_fn, oracle_sql | None). ``spark_fn(spark,
sf_dir)`` returns a DataFrame; the SQL runs on DuckDB views named after the
parquet tables (region nation customer supplier part orders lineitem events
documents embeddings). The driver compares row count + schema + an
order-insensitive value hash, with columns sorted by name — so BOTH sides
alias every column identically and round floats to 6dp (sums of doubles
differ in the last ulp across engines/partitionings; integer-derived values
are exact).

The corpus here is the driver's ``documents`` table (doc_id, text, lang,
source, n_chars); the class key is ``lang`` — the same operators run on the
(repo, path, commit, lang, content) source-code corpus in bench.py and the
index layer.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import bm25_topk, doc_scores, queries_df, query_terms
from bertopic_spark.operators.ctfidf import ctfidf, term_stats, top_k_terms
from bertopic_spark.operators.postings import class_term_counts, doc_term_counts
from bertopic_spark.tokenizer import duckdb_tokens_sql, tokenize_one

MODE = "ascii_code"

# Fixed retrieval query set over the documents-table vocabulary.
DRIVER_QUERIES = {
    0: "table scan",
    1: "hash join order",
    2: "the slow query",
    3: "spark filter window",
    4: "customer batch value",
    5: "merge sort key",
    6: "group data row",
    7: "small part line",
}

# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB). Mirrors operators/{postings,ctfidf,bm25}.py.
# ---------------------------------------------------------------------------

_TOKS = f"""
toks AS (
  SELECT doc_id, lang, source,
         unnest({duckdb_tokens_sql('text', MODE)}) AS term
  FROM documents
)"""

_XDOC = """
xdoc AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
)"""

_XCLS = """
xcls AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY lang, term
)"""


def _stats_sql(x: str, keys: str, bm25: bool) -> str:
    """df/idf CTEs over count relation ``x`` grouped per-``keys`` rows."""
    idf = (
        "ln(greatest(1.0 + (a - df + 0.5) / (df + 0.5), 1e-10))"
        if bm25
        else "ln(a / df + 1.0)"
    )
    return f"""
clen AS (SELECT {keys}, CAST(sum(tf) AS BIGINT) AS class_len FROM {x} GROUP BY {keys}),
avgn AS (SELECT CAST(floor(avg(class_len)) AS BIGINT) AS a FROM clen),
dft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS df FROM {x} GROUP BY term),
idf AS (SELECT term, df, {idf} AS idf FROM dft CROSS JOIN avgn)"""


def _scores_sql(x: str, keys: str, bm25: bool, sqrt: bool) -> str:
    tfn = "sqrt(x.tf / clen.class_len)" if sqrt else "(x.tf / clen.class_len)"
    return f"""
{_stats_sql(x, keys, bm25)},
scores AS (
  SELECT {', '.join('x.' + k for k in keys.split(', '))}, x.term,
         {tfn} * idf.idf AS score
  FROM {x} x JOIN clen USING ({keys}) JOIN idf USING (term)
)"""


def _query_term_values() -> str:
    pairs = []
    for qid, text in sorted(DRIVER_QUERIES.items()):
        for t in sorted(set(tokenize_one(text, MODE))):
            pairs.append(f"({qid}, '{t}')")
    return ", ".join(pairs)


# ---------------------------------------------------------------------------
# Spark-side helpers
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_x(spark, sf_dir) -> DataFrame:
    return doc_term_counts(_docs(spark, sf_dir), "text", ["doc_id"], MODE)


def _cls_x(spark, sf_dir) -> DataFrame:
    return class_term_counts(
        doc_term_counts(_docs(spark, sf_dir), "text", ["lang", "doc_id"], MODE), ["lang"]
    )


def _r6(c):
    return F.round(c, 6)


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

def q_tokenize_doc_counts(spark, sf_dir):
    """T1: tokenize + per-doc counts (SURVEY §2.3)."""
    return _doc_x(spark, sf_dir).select("doc_id", "term", "tf")


SQL_TOKENIZE = f"WITH {_TOKS}, {_XDOC} SELECT doc_id, term, tf FROM xdoc"


def q_class_postings(spark, sf_dir):
    """A1: class×term counts — the X matrix (SURVEY §2.4)."""
    return _cls_x(spark, sf_dir).select("lang", "term", "tf")


SQL_CLASS_POSTINGS = f"WITH {_TOKS}, {_XCLS} SELECT lang, term, tf FROM xcls"


def _q_term_stats(bm25: bool):
    def fn(spark, sf_dir):
        x = _cls_x(spark, sf_dir)
        s = term_stats(x, ["lang"], bm25_weighting=bm25)
        return s.select("term", "df", _r6(F.col("idf")).alias("idf"))

    return fn


def _sql_term_stats(bm25: bool) -> str:
    return (
        f"WITH {_TOKS}, {_XCLS}, {_stats_sql('xcls', 'lang', bm25)} "
        "SELECT term, df, round(idf, 6) AS idf FROM idf"
    )


def _q_ctfidf_topk(bm25: bool, sqrt: bool, k: int = 10):
    def fn(spark, sf_dir):
        x = _cls_x(spark, sf_dir)
        s = ctfidf(x, ["lang"], bm25_weighting=bm25, reduce_frequent_words=sqrt)
        t = top_k_terms(s, ["lang"], k)
        return t.select(
            "lang", "term", _r6(F.col("score")).alias("score"),
            F.col("rank").cast("long").alias("rn"),
        )

    return fn


def _sql_ctfidf_topk(bm25: bool, sqrt: bool, k: int = 10) -> str:
    return f"""WITH {_TOKS}, {_XCLS}, {_scores_sql('xcls', 'lang', bm25, sqrt)},
ranked AS (
  SELECT lang, term, score,
         row_number() OVER (PARTITION BY lang ORDER BY score DESC, term ASC) AS rn
  FROM scores)
SELECT lang, term, round(score, 6) AS score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {k}"""


def q_bm25_doc_topk(spark, sf_dir):
    """J4/W1: inverted-index BM25 retrieval, top-10 per query (SURVEY §3.2)."""
    scores = doc_scores(_docs(spark, sf_dir), text_col="text", id_col="doc_id", mode=MODE)
    qt = query_terms(queries_df(spark, DRIVER_QUERIES), MODE)
    t = bm25_topk(scores, qt, k=10)
    return t.select(
        "query_id", "doc_id", _r6(F.col("score")).alias("score"),
        F.col("rank").cast("long").alias("rn"),
    )


SQL_BM25_DOC_TOPK = f"""WITH {_TOKS}, {_XDOC}, {_scores_sql('xdoc', 'doc_id', True, False)},
q(query_id, term) AS (VALUES {_query_term_values()}),
hits AS (
  SELECT q.query_id, s.doc_id, sum(s.score) AS score
  FROM q JOIN scores s USING (term) GROUP BY q.query_id, s.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
  FROM hits)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, round(score, 6) AS score,
       CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 10"""


def q_topic_sizes(spark, sf_dir):
    """A5: group sizes (reference Counter(topics), _bertopic.py:4461)."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


SQL_TOPIC_SIZES = (
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY lang"
)


def q_topics_per_class(spark, sf_dir):
    """A6: per-slice c-TF-IDF with frozen global idf (topics_per_class,
    reference _bertopic.py:996-1016) — one pass, no per-slice loop."""
    docs = _docs(spark, sf_dir)
    dt = doc_term_counts(docs, "text", ["lang", "source", "doc_id"], MODE)
    x_global = class_term_counts(dt, ["lang"])
    stats = term_stats(x_global, ["lang"], bm25_weighting=False)
    x_slice = class_term_counts(dt, ["lang", "source"])
    s = ctfidf(x_slice, ["lang", "source"], stats=stats)
    t = top_k_terms(s, ["lang", "source"], 3)
    return t.select(
        "lang", "source", "term", _r6(F.col("score")).alias("score"),
        F.col("rank").cast("long").alias("rn"),
    )


SQL_TOPICS_PER_CLASS = f"""WITH {_TOKS}, {_XCLS},
{_stats_sql('xcls', 'lang', False)},
xslice AS (
  SELECT lang, source, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY lang, source, term),
slen AS (
  SELECT lang, source, CAST(sum(tf) AS BIGINT) AS class_len
  FROM xslice GROUP BY lang, source),
scores AS (
  SELECT x.lang, x.source, x.term, (x.tf / slen.class_len) * idf.idf AS score
  FROM xslice x JOIN slen USING (lang, source) JOIN idf USING (term)),
ranked AS (
  SELECT lang, source, term, score,
         row_number() OVER (PARTITION BY lang, source ORDER BY score DESC, term ASC) AS rn
  FROM scores)
SELECT lang, source, term, round(score, 6) AS score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 3"""


def q_topics_over_time(spark, sf_dir):
    """A6/F3: time-sliced c-TF-IDF (topics_over_time, _bertopic.py:797-954);
    deterministic synthetic slice = doc_id % 7 (FIXTURES.md §4 pattern)."""
    docs = _docs(spark, sf_dir).withColumn("slice_id", F.col("doc_id") % 7)
    dt = doc_term_counts(docs, "text", ["lang", "slice_id", "doc_id"], MODE)
    x_global = class_term_counts(dt, ["lang"])
    stats = term_stats(x_global, ["lang"], bm25_weighting=False)
    x_slice = class_term_counts(dt, ["slice_id", "lang"])
    s = ctfidf(x_slice, ["slice_id", "lang"], stats=stats)
    t = top_k_terms(s, ["slice_id", "lang"], 3)
    return t.select(
        "slice_id", "lang", "term", _r6(F.col("score")).alias("score"),
        F.col("rank").cast("long").alias("rn"),
    )


SQL_TOPICS_OVER_TIME = f"""WITH
toks AS (
  SELECT doc_id, lang, doc_id % 7 AS slice_id,
         unnest({duckdb_tokens_sql('text', MODE)}) AS term
  FROM documents),
xcls AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY lang, term),
{_stats_sql('xcls', 'lang', False)},
xslice AS (
  SELECT slice_id, lang, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY slice_id, lang, term),
slen AS (
  SELECT slice_id, lang, CAST(sum(tf) AS BIGINT) AS class_len
  FROM xslice GROUP BY slice_id, lang),
scores AS (
  SELECT x.slice_id, x.lang, x.term, (x.tf / slen.class_len) * idf.idf AS score
  FROM xslice x JOIN slen USING (slice_id, lang) JOIN idf USING (term)),
ranked AS (
  SELECT slice_id, lang, term, score,
         row_number() OVER (PARTITION BY slice_id, lang ORDER BY score DESC, term ASC) AS rn
  FROM scores)
SELECT slice_id, lang, term, round(score, 6) AS score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 3"""


def q_events_hourly(spark, sf_dir):
    """F3: tumbling time-window aggregation on the events stream table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


SQL_EVENTS_HOURLY = (
    "SELECT date_trunc('hour', ts) AS hour_ts, event_type, "
    "CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value "
    "FROM events GROUP BY 1, 2"
)


def q_pricing_summary(spark, sf_dir):
    """Relational coverage (P6/A/W7): TPC-H Q1-style pricing summary."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


REGISTRY: Dict[str, Tuple[Callable[[SparkSession, str], DataFrame], Optional[str]]] = {
    "tokenize_doc_counts": (q_tokenize_doc_counts, SQL_TOKENIZE),
    "class_postings": (q_class_postings, SQL_CLASS_POSTINGS),
    "term_stats_default": (_q_term_stats(False), _sql_term_stats(False)),
    "term_stats_bm25": (_q_term_stats(True), _sql_term_stats(True)),
    "ctfidf_topk_default": (_q_ctfidf_topk(False, False), _sql_ctfidf_topk(False, False)),
    "ctfidf_topk_bm25_sqrt": (_q_ctfidf_topk(True, True), _sql_ctfidf_topk(True, True)),
    "bm25_doc_topk": (q_bm25_doc_topk, SQL_BM25_DOC_TOPK),
    "topic_sizes": (q_topic_sizes, SQL_TOPIC_SIZES),
    "topics_per_class": (q_topics_per_class, SQL_TOPICS_PER_CLASS),
    "topics_over_time": (q_topics_over_time, SQL_TOPICS_OVER_TIME),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
}
