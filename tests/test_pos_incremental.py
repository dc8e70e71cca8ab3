"""IncrementalPositions: generational positional maintenance must be
content-identical to a full positional rebuild at every point (append,
delete, as_of, compact) — phrase serving included."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.index.positions import IncrementalPositions
from bertopic_spark.operators.fulltext import (doc_term_positions,
                                               phrase_match_postings)

B1 = [(0, "alpha beta gamma"), (1, "beta gamma delta")]
B2 = [(2, "alpha beta again here"), (3, "gamma beta gamma")]
TERMS = ["alpha", "beta", "gamma", "delta", "again", "here"]


def _rows(df):
    return sorted((r["doc_id"], r["term"], r["pos"]) for r in df.collect())


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def idx(spark, tmp_path):
    ix = IncrementalPositions.create(spark, str(tmp_path / "pos"),
                                     mode="ascii_code")
    ix.append(_mk(spark, B1), text_col="text")
    ix.append(_mk(spark, B2), text_col="text")
    return ix


def test_append_equals_rebuild(spark, idx):
    full = doc_term_positions(_mk(spark, B1 + B2), "text", "doc_id")
    assert _rows(idx.read(TERMS)) == _rows(full)
    assert idx.status()["live_docs"] == 4


def test_phrase_serving_parity(spark, idx):
    got = {(r["doc_id"], r["n_matches"]) for r in
           phrase_match_postings(idx.read(["beta", "gamma"]),
                                 ["beta", "gamma"]).collect()}
    assert got == {(0, 1), (1, 1), (3, 1)}


def test_delete_and_as_of(spark, idx):
    idx.delete([1, 2])
    survivors = [B1[0], B2[1]]
    full = doc_term_positions(_mk(spark, survivors), "text", "doc_id")
    assert _rows(idx.read(TERMS)) == _rows(full)
    assert idx.status()["live_docs"] == 2
    # as_of(2): before the delete
    old = idx.as_of(2)
    assert _rows(old.read(TERMS)) == _rows(
        doc_term_positions(_mk(spark, B1 + B2), "text", "doc_id"))
    with pytest.raises(ValueError, match="read-only"):
        old.delete([0])
    with pytest.raises(ValueError, match="already tombstoned"):
        idx.delete([1])


def test_compact_preserves_content(spark, tmp_path, idx):
    idx.delete([0])
    before = _rows(idx.read(TERMS))
    idx.compact()
    assert idx.status() == {"generations": 1, "adds": 1, "deletes": 0,
                            "live_docs": 3}
    assert _rows(idx.read(TERMS)) == before
    # reopen from manifest only
    re = IncrementalPositions.open(spark, idx.root)
    assert _rows(re.read(TERMS)) == before


def test_overlap_and_validation(spark, idx):
    with pytest.raises(ValueError, match="already exist"):
        idx.append(_mk(spark, [(3, "dup id")]), text_col="text")
    with pytest.raises(ValueError, match="zero documents"):
        idx.append(_mk(spark, []), text_col="text")
    with pytest.raises(ValueError, match="already exists"):
        IncrementalPositions.create(spark, idx.root)
