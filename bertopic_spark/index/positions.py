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


# ---------------------------------------------------------------------------
# Compressed positional blocks: delta+varint, same (term, blk) range-aligned
# grid as the scoring blocks (index/blocks.py layout rationale applies —
# the composite key is the skew handling).
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd
from pyspark.sql.types import BinaryType

from bertopic_spark.index.blocks import (DEFAULT_SPAN, _varint_decode_np,
                                         _varint_encode_np)

POS_BLOCK_SCHEMA = ("term string, blk long, n_docs long, n_pos long, "
                    "payload binary, bucket int")


def encode_pos_block(doc_ids, counts, flat_pos, range_start: int) -> bytes:
    """Payload = varint(doc-id deltas vs range_start) ‖ varint(per-doc
    position counts) ‖ varint(per-doc delta-encoded positions, first
    absolute). Fully numpy-vectorized; byte-deterministic."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    cts = np.asarray(counts, dtype=np.int64)
    ps = np.asarray(flat_pos, dtype=np.int64)
    id_deltas = np.diff(ids, prepend=np.int64(range_start))
    # per-doc position deltas without a Python loop: subtract the previous
    # position everywhere, then restore each run's first value to absolute
    pd_ = np.diff(ps, prepend=np.int64(0))
    starts = np.zeros(len(cts), dtype=np.int64)
    if len(cts) > 1:
        starts[1:] = np.cumsum(cts[:-1])
    pd_[starts] = ps[starts]
    return (_varint_encode_np(id_deltas) + _varint_encode_np(cts)
            + _varint_encode_np(pd_))


def decode_pos_block(payload: bytes, range_start: int, n_docs: int,
                     n_pos: int):
    """Inverse of encode_pos_block → (doc_ids, counts, flat_positions)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    id_deltas, off = _varint_decode_np(buf, 0, n_docs)
    cts, off = _varint_decode_np(buf, off, n_docs)
    pd_, _ = _varint_decode_np(buf, off, n_pos)
    id_deltas = np.asarray(id_deltas, dtype=np.int64)
    cts = np.asarray(cts, dtype=np.int64)
    pd_ = np.asarray(pd_, dtype=np.int64)
    ids = np.cumsum(id_deltas) + range_start
    ps = np.cumsum(pd_)
    starts = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        starts[1:] = np.cumsum(cts[:-1])
    # undo the cross-run cumsum carry: subtract, per run, the carry-in
    carry = ps[starts - 1] if n_docs > 0 else np.array([], dtype=np.int64)
    if n_docs > 0:
        carry = np.where(starts > 0, carry, 0)
        ps = ps - np.repeat(carry, cts)
    return ids, cts.astype(np.int64), ps


def build_pos_blocks(positions: DataFrame,
                     span: int = DEFAULT_SPAN) -> DataFrame:
    """(term, blk, n_docs, n_pos, payload) from a (doc_id, term, pos)
    relation — one shuffle on the range-aligned (term, blk) key; the
    varint pack runs vectorized over JVM-pre-grouped arrays (the same
    plan shape the scoring-block build measured fastest)."""

    # JVM-side struct-field extraction hands the UDF plain numpy arrays per
    # block (the same trick as segments.build_block_index) — the Python
    # side never touches a per-position dict/row object
    @F.pandas_udf(BinaryType())
    def enc(blk: pd.Series, ids: pd.Series, ps: pd.Series) -> pd.Series:
        out = []
        for b, i, p in zip(blk, ids, ps):
            i = np.asarray(i, dtype=np.int64)
            p = np.asarray(p, dtype=np.int64)
            uids, cts = np.unique(i, return_counts=True)
            out.append(encode_pos_block(uids, cts, p, int(b) * span))
        return pd.Series(out)

    grouped = (positions
               .withColumn("blk", (F.col("doc_id") / span).cast("long"))
               .groupBy("term", "blk")
               .agg(F.count_distinct("doc_id").alias("n_docs"),
                    F.count(F.lit(1)).alias("n_pos"),
                    F.sort_array(F.collect_list(
                        F.struct("doc_id", "pos"))).alias("pl")))
    return (grouped.withColumn(
        "payload", enc(F.col("blk"), F.col("pl.doc_id"), F.col("pl.pos")))
            .drop("pl"))


def write_pos_segments(blocks: DataFrame, path: str,
                       n_buckets: int = N_TERM_BUCKETS) -> None:
    out = blocks.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    (out.repartition("bucket").sortWithinPartitions("term", "blk")
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_pos_segments(spark, path: str, terms,
                      n_buckets: int = N_TERM_BUCKETS,
                      span: int = DEFAULT_SPAN) -> DataFrame:
    """Pruned + decoded positional scan: (doc_id, term, pos). Bucket
    PartitionFilters driver-side, term pushed to parquet, payloads decode
    in Arrow batches (numpy cumsums, no per-position Python)."""
    ts = sorted(set(str(t) for t in terms))
    if not ts:
        raise ValueError("need at least one term")
    buckets = sorted({term_bucket(t, n_buckets) for t in ts})
    df = (spark.read.schema(POS_BLOCK_SCHEMA).parquet(path)
          .filter(F.col("bucket").isin(buckets) & F.col("term").isin(ts)))

    def gen(batches):
        for b in batches:
            pdf = b
            rows = {"doc_id": [], "term": [], "pos": []}
            for term, blk, nd, npos, payload in zip(
                    pdf["term"], pdf["blk"], pdf["n_docs"], pdf["n_pos"],
                    pdf["payload"]):
                ids, cts, ps = decode_pos_block(payload, int(blk) * span,
                                                int(nd), int(npos))
                rows["doc_id"].append(np.repeat(ids, cts))
                rows["term"].append(np.full(int(npos), term, dtype=object))
                rows["pos"].append(ps)
            if rows["doc_id"]:
                yield pd.DataFrame({
                    "doc_id": np.concatenate(rows["doc_id"]),
                    "term": np.concatenate(rows["term"]),
                    "pos": np.concatenate(rows["pos"]).astype(np.int32)})

    return df.mapInPandas(gen, "doc_id long, term string, pos int")
