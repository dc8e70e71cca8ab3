"""Iceberg source adapter: parquet fallback contract (this container has
no Iceberg jars — the adapter must degrade loudly and correctly)."""

import pytest

from bertopic_spark.sources.iceberg import (CORPUS_COLUMNS,
                                            iceberg_available,
                                            read_code_corpus)


def test_fallback_reads_parquet_contract(spark, corpus_df, tmp_path):
    p = str(tmp_path / "corpus.parquet")
    corpus_df.write.mode("overwrite").parquet(p)
    got = read_code_corpus(spark, p)
    assert set(CORPUS_COLUMNS) <= set(got.columns)
    assert got.count() == corpus_df.count()
    # snapshot pinning must fail loudly on the parquet fallback
    with pytest.raises(ValueError):
        read_code_corpus(spark, p, snapshot_id=123)
    # this container has no Iceberg runtime — the probe must say so
    assert iceberg_available(spark) is False


def test_contract_violation_fails_loudly(spark, tmp_path):
    p = str(tmp_path / "bad.parquet")
    spark.range(3).write.mode("overwrite").parquet(p)
    with pytest.raises(ValueError, match="missing columns"):
        read_code_corpus(spark, p)
