"""Fulltext operators: phrase match, boolean queries, positional postings.

The scan path and the postings path are independent physical strategies for
the same semantics — equality between them on arbitrary corpora is the core
invariant here (the oracle gates additionally check each against DuckDB).
"""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.fulltext import (
    boolean_match,
    boolean_match_postings,
    doc_term_positions,
    phrase_match,
    phrase_match_postings,
)
from bertopic_spark.tokenizer import tokenize_one

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _pairs(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("phrase", ["part filter", "batch batch", "order"])
def test_phrase_scan_equals_postings(spark, docs, phrase):
    scan = phrase_match(docs, phrase, "text", "doc_id")
    pos = doc_term_positions(docs, "text", "doc_id")
    idx = phrase_match_postings(pos, tokenize_one(phrase, "ascii_code"))
    assert _pairs(scan) == _pairs(idx)
    assert scan.count() > 0  # phrase chosen to hit the fixture corpus


def test_phrase_overlapping_occurrences(spark):
    t = spark.createDataFrame(
        [(1, "aa aa aa aa bb"), (2, "aa bb aa"), (3, "cc")],
        "doc_id long, text string")
    # "aa aa" starts at positions 0,1,2 → 3 overlapping matches
    assert _pairs(phrase_match(t, "aa aa")) == {(1, 3)}
    assert _pairs(phrase_match_postings(
        doc_term_positions(t), ["aa", "aa"])) == {(1, 3)}
    # trigram spans the overlap too
    assert _pairs(phrase_match(t, "aa aa aa")) == {(1, 2)}


def test_phrase_edge_cases(spark):
    t = spark.createDataFrame([(1, "xx yy"), (2, None), (3, "")],
                              "doc_id long, text string")
    assert _pairs(phrase_match(t, "xx yy")) == {(1, 1)}
    assert phrase_match(t, "yy xx").count() == 0  # order matters
    with pytest.raises(ValueError):
        phrase_match(t, "!!")  # tokenizes to nothing


def test_boolean_scan_equals_postings(spark, docs):
    kw = dict(must=["part"], should=["filter", "window"],
              must_not=["spark"], min_should=1)
    scan = boolean_match(docs, text_col="text", id_col="doc_id", **kw)
    pos = doc_term_positions(docs, "text", "doc_id")
    idx = boolean_match_postings(pos, **kw)
    assert _pairs(scan) == _pairs(idx)
    assert scan.count() > 0


def test_boolean_semantics(spark):
    t = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb dd"), (3, "aa zz"), (4, "bb cc"),
         (5, "qq")],
        "doc_id long, text string")
    pos = doc_term_positions(t)
    for fn in (lambda **kw: boolean_match(t, **kw),
               lambda **kw: boolean_match_postings(pos, **kw)):
        # must + min_should=2: needs both bb and cc
        got = _pairs(fn(must=["aa"], should=["bb", "cc"], min_should=2))
        assert got == {(1, 3)}
        # must_not knocks out doc 2
        got = _pairs(fn(must=["aa"], should=["bb"], must_not=["dd"]))
        assert got == {(1, 2)}
        # doc whose only query terms are must_not terms is rejected
        got = _pairs(fn(must=[], should=["zz"], must_not=["aa"]))
        assert got == set()
        with pytest.raises(ValueError):
            fn(must=[], should=[])


def test_frequent_line_removal_edges(spark):
    from bertopic_spark.operators.dedup import frequent_line_removal

    t = spark.createDataFrame(
        [(1, "dup\nunique one\ndup"), (2, "dup\nother"), (3, "dup"),
         (4, "solo text")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["text_clean"], r["n_lines_kept"],
                         r["n_lines_removed"])
           for r in frequent_line_removal(t, min_count=3).collect()}
    assert out[1] == ("unique one", 1, 2)
    assert out[2] == ("other", 1, 1)
    assert out[3] == ("", 0, 1)  # fully-boilerplate doc survives as a row
    assert out[4] == ("solo text", 1, 0)
    assert len(out) == 4


def test_decontaminate_marks_exact_overlap(spark):
    from bertopic_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the secret eval answer key")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "prefix the secret eval answer key suffix"),  # contains 5-gram
         (2, "the secret eval differs here entirely"),     # only a 3-gram
         (3, "clean document with no overlap at all")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_shared"]
           for r in decontaminate(train, bench, n=5).collect()}
    assert got == {1: 1}
    # with n=3 the partial overlap in doc 2 is caught too
    got3 = {r["doc_id"]: r["n_shared"]
            for r in decontaminate(train, bench, n=3).collect()}
    assert set(got3) == {1, 2} and got3[1] == 3 and got3[2] == 1


def test_doc_term_positions_prune(spark, docs):
    pos = doc_term_positions(docs, "text", "doc_id", terms=["part"])
    terms = pos.select("term").distinct().collect()
    assert [r["term"] for r in terms] == ["part"]
    # positions are 0-based token offsets
    first = (doc_term_positions(docs, "text", "doc_id")
             .groupBy("doc_id").agg(F.min("pos").alias("m"))
             .agg(F.min("m"), F.max("m")).collect()[0])
    assert first[0] == 0 == first[1]
