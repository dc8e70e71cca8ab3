"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (BM25 top-k retrieval over the
sf0.001 documents corpus). ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle; pairs are
defined side-by-side in ``bertopic_spark/entry_queries.py`` so the Spark
plan and the SQL can't drift apart silently. ``tests/oracle_crosscheck.py``
replays the driver's compare locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 retrieval."""
    from bertopic_spark.entry_queries import REGISTRY

    return REGISTRY["bm25_doc_topk"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bertopic_spark.entry_queries import REGISTRY

    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from bertopic_spark.entry_queries import REGISTRY

    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
