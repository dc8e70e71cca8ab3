"""Positional index segments: the persisted (doc_id, term, pos) relation
behind phrase / proximity / boolean queries, bucketed exactly like the
scoring segments (index/segments.py:129) so a query's terms prune to
≤ |q| directory buckets + parquet term min/max row-group stats.

Lucene stores positions next to postings; here they are a SEPARATE parquet
tree — the scoring path never pays for positions it doesn't read, and the
positional tree is only scanned by the operators that need adjacency
(`phrase_match_postings`, `proximity_match_postings`,
`*_match_postings`). Delta-encoding positions into the block codec
(index/blocks.py) is the next compression step; the relation contract here
is what the query operators consume either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bertopic_spark.index.segments import N_TERM_BUCKETS, term_bucket

POS_SCHEMA = "doc_id long, term string, pos int, bucket int"


def write_positions(positions: DataFrame, path: str,
                    n_buckets: int = N_TERM_BUCKETS) -> None:
    """Persist a (doc_id, term, pos) relation partitioned by term bucket,
    sorted by (term, doc_id, pos) within files for row-group pruning and
    run-length-friendly encoding."""
    out = positions.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    (out.select(F.col("doc_id").cast("long"), "term",
                F.col("pos").cast("int"), "bucket")
     .repartition("bucket")
     .sortWithinPartitions("term", "doc_id", "pos")
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_positions(spark, path: str, terms,
                   n_buckets: int = N_TERM_BUCKETS) -> DataFrame:
    """Pruned positional scan for a term set: bucket PartitionFilters are
    computed DRIVER-SIDE (pure-Python XXH64, bit-identical to the writer —
    no Spark job to plan the scan), term equality pushes to parquet.
    Explicit schema so an empty index is servable."""
    ts = sorted(set(str(t) for t in terms))
    if not ts:
        raise ValueError("need at least one term")
    buckets = sorted({term_bucket(t, n_buckets) for t in ts})
    df = spark.read.schema(POS_SCHEMA).parquet(path)
    return (df.filter(F.col("bucket").isin(buckets)
                      & F.col("term").isin(ts))
            .select("doc_id", "term", "pos"))
