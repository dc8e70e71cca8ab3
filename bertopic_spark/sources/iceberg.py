"""Iceberg source adapter for the code-corpus table
(repo, path, commit, lang, content[, content_sha]).

The north-rule input is an Iceberg table; this container has no Iceberg
runtime jars, so the adapter probes for the DataSource at call time and
falls back to a parquet directory with the SAME schema contract. Both
paths return an identical relation — every downstream operator is
source-agnostic. On a real cluster the Iceberg path additionally gives:

* snapshot isolation — ``snapshot_id``/``as_of_timestamp`` pin the build's
  input, which is what makes the checkpoint fingerprint + sha256 invariant
  meaningful across a multi-hour 10^12-file build;
* hidden-partition pruning (e.g. bucket(repo)) and file-level min/max
  skipping, which Catalyst uses exactly like the parquet PartitionFilters
  this repo's plans demonstrate;
* incremental scans (changelog between snapshots) — the natural feed for
  index/incremental.py's O(delta) append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def iceberg_available(spark) -> bool:
    """True iff the Iceberg DataSource is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_code_corpus(spark, source: str,
                     snapshot_id: int | None = None,
                     as_of_timestamp: int | None = None) -> DataFrame:
    """Read the code-corpus table from an Iceberg table name (when the
    runtime has Iceberg) or a parquet path (fallback; snapshot pinning
    rejected — parquet has no snapshots).

    ``source`` is an Iceberg table identifier (``catalog.db.table``) or a
    filesystem path. Column contract enforced either way.
    """
    looks_like_path = "/" in source or source.endswith(".parquet")
    if not looks_like_path and iceberg_available(spark):
        r = spark.read.format("iceberg")
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            r = r.option("as-of-timestamp", str(as_of_timestamp))
        df = r.load(source)
    else:
        if snapshot_id is not None or as_of_timestamp is not None:
            raise ValueError(
                "snapshot pinning needs an Iceberg runtime; the parquet "
                "fallback has no snapshots")
        df = spark.read.parquet(source)
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus source {source!r} is missing columns {missing}; "
            f"contract is {CORPUS_COLUMNS}")
    return df
