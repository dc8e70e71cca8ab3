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


def test_bench_enumerates_every_registry_query():
    """bench.py's curated list stays inside the registry (a typo would
    KeyError mid-bench) and, with the auto-appended tail, covers ALL of
    it — no gate ships without a cost row."""
    import re

    import __spark_entry__ as e

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "bench.py")).read()
    curated = re.findall(
        r'"([^"]+)"',
        re.search(r"BENCH_QUERIES = \[(.*?)\n\]", src, re.S).group(1))
    names = set(e.queries())
    unknown = [n for n in curated if n not in names]
    assert not unknown, f"bench names not in registry: {unknown}"
    assert len(curated) == len(set(curated)), "duplicate bench names"
    tail = sorted(k for k in names if k not in set(curated))
    assert set(curated) | set(tail) == names
