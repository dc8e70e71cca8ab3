"""ES intervals query: rule-tree compilation hand cases (match / any_of /
ordered all_of with max_gaps; nesting; distinct-occurrence counting)."""

import pytest

from bertopic_spark.operators.fulltext import intervals_match


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "aa bb cc dd"),          # phrase "aa bb" then cc at gap 0
        (1, "aa bb xx xx xx cc"),    # gap 3
        (2, "cc aa bb"),             # cc BEFORE the phrase: unordered
        (3, "aa xx bb cc"),          # "aa bb" not adjacent: no phrase
        (4, "aa bb aa bb cc"),       # two phrase starts, one cc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return {r["doc_id"]: (r["n_occ"], r["min_span"]) for r in df.collect()}


def test_match_phrase_rule(docs):
    out = _rows(intervals_match(docs, {"match": ["aa", "bb"]},
                                text_col="text"))
    assert out == {0: (1, 2), 1: (1, 2), 2: (1, 2), 4: (2, 2)}


def test_all_of_gap_budget(docs):
    rule = {"all_of": [{"match": ["aa", "bb"]}, {"match": ["cc"]}],
            "ordered": True, "max_gaps": 0}
    assert _rows(intervals_match(docs, rule, text_col="text")) == {
        0: (1, 3), 4: (1, 3)}
    rule3 = dict(rule, max_gaps=3)
    out = _rows(intervals_match(docs, rule3, text_col="text"))
    # doc 1 gap=3 now matches; doc 4's first phrase is 2 gaps from cc
    assert out == {0: (1, 3), 1: (1, 6), 4: (2, 3)}


def test_unlimited_gaps_and_order(docs):
    rule = {"all_of": [{"match": ["aa", "bb"]}, {"match": ["cc"]}],
            "ordered": True, "max_gaps": -1}
    out = _rows(intervals_match(docs, rule, text_col="text"))
    assert 2 not in out  # cc precedes the phrase: ordered all_of rejects


def test_any_of_union_and_nesting(docs):
    rule = {"all_of": [{"any_of": [{"match": ["aa", "bb"]},
                                   {"match": ["xx"]}]},
                       {"match": ["cc"]}],
            "ordered": True, "max_gaps": 0}
    out = _rows(intervals_match(docs, rule, text_col="text"))
    # doc 1: xx at pos 4 adjacent to cc at 5; doc 3: bb? no — xx at 1 not
    # adjacent to cc(3); phrase absent. doc 0/4 via the phrase branch.
    assert out == {0: (1, 3), 1: (1, 2), 4: (1, 3)}


def test_invalid_rules(docs):
    with pytest.raises(ValueError):
        intervals_match(docs, {"all_of": [{"match": ["aa"]}]},
                        text_col="text").collect()
    with pytest.raises(ValueError):
        intervals_match(docs, {"bogus": 1}, text_col="text").collect()
