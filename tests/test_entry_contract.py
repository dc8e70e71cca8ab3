"""The driver-contract gate, replayed locally: every queries() entry must
match its oracle_sql() on DuckDB (row count + schema + values)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names


def test_all_queries_match_duckdb_oracle(spark):
    from tests.oracle_crosscheck import main

    assert main("/root/testdata/sf0.001") == 0
