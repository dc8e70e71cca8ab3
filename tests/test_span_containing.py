"""span_containing / span_within semantics: hand-case pins + scan vs
postings path parity on the fixture corpus."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.fulltext import (doc_term_positions,
                                               span_containing_match,
                                               span_within_match,
                                               span_within_match_postings)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # a(0) x(1) b(2): x within [a..b]
        (0, "aa xx bb"),
        # a(0) b(1) x(2): x OUTSIDE the span
        (1, "aa bb xx"),
        # a(0) c c c c c c b(7): slop 2 -> span 8 > 2+2, no valid big
        (2, "aa cc cc cc cc cc cc bb xx"),
        # two bigs: a(0) b(2) and a(3) x(4) b(5); only second contains x
        (3, "aa cc bb aa xx bb"),
        # duplicate little inside one span: a(0) x(1) x(2) b(3)
        (4, "aa xx xx bb"),
        (5, "xx aa bb"),  # little before the span
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_within_hand_cases(docs):
    out = span_within_match(docs, "xx", ("aa", "bb"), slop=2,
                            text_col="text").collect()
    got = {(r["doc_id"], r["pos"]) for r in out}
    assert got == {(0, 1), (3, 4), (4, 1), (4, 2)}


def test_span_containing_hand_cases(docs):
    out = span_containing_match(docs, ("aa", "bb"), "xx", slop=2,
                                text_col="text").collect()
    got = {(r["doc_id"], r["n_contained"]) for r in out}
    assert got == {(0, 1), (3, 1), (4, 2)}


def test_wide_slop_recovers_doc2(docs):
    out = span_within_match(docs, "xx", ("aa", "bb"), slop=6,
                            text_col="text").collect()
    assert (2, 8) not in {(r["doc_id"], r["pos"]) for r in out}
    # doc 2's x at pos 8 is AFTER b(7); widen to a doc with x inside
    got = {r["doc_id"] for r in out}
    assert got == {0, 3, 4}


def test_degenerate_single_term_big(docs):
    # big = little term itself: contained iff positions coincide
    out = span_within_match(docs, "xx", ("xx",), slop=0,
                            text_col="text").collect()
    assert (1, 2) in {(r["doc_id"], r["pos"]) for r in out}


def test_postings_path_parity(docs):
    pos = doc_term_positions(docs, "text", "doc_id", "ascii_code")
    scan = span_within_match(docs, "xx", ("aa", "bb"), slop=2,
                             text_col="text")
    idx = span_within_match_postings(pos, "xx", ("aa", "bb"), slop=2)
    a = {(r["doc_id"], r["pos"]) for r in scan.collect()}
    b = {(r["doc_id"], r["pos"]) for r in idx.collect()}
    assert a == b


def test_postings_parity_on_corpus(corpus_df):
    sub = corpus_df.limit(120)
    pos = doc_term_positions(sub, "content", "doc_id", "ascii_code")
    scan = span_within_match(sub, "return", ("def", "if"), slop=12,
                             text_col="content")
    idx = span_within_match_postings(pos, "return", ("def", "if"), slop=12)
    a = {(r["doc_id"], r["pos"]) for r in scan.collect()}
    b = {(r["doc_id"], r["pos"]) for r in idx.collect()}
    assert a == b
