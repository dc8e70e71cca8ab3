"""Multi-fragment highlighting (operators/fulltext.top_snippets): fixed-tile
fragments ranked by hit count, ES number_of_fragments analog."""

import pytest

from bertopic_spark.operators.fulltext import best_snippet, top_snippets


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # window 4 → tiles [0:4) [4:8) [8:12): hits 1 / 2 / 0
        (0, "cat xx yy zz cat ww cat vv uu tt ss rr"),
        (1, "nothing relevant here at all"),
        (2, "cat cat cat cat"),  # one tile, 4 hits
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tiles_ranked_by_hits(spark, docs):
    out = top_snippets(docs, ["cat"], n_fragments=2, window=4).collect()
    by = {(r["doc_id"], r["frag_rank"]): r for r in out}
    # doc 0: tile 1 (2 hits) outranks tile 0 (1 hit); tile 2 (0 hits) absent
    assert by[(0, 1)]["start"] == 4 and by[(0, 1)]["n_hits"] == 2
    assert by[(0, 1)]["snippet"] == "cat ww cat vv"
    assert by[(0, 2)]["start"] == 0 and by[(0, 2)]["n_hits"] == 1
    # doc 1 matches nothing → no rows
    assert not any(r["doc_id"] == 1 for r in out)
    # doc 2: single tile with all 4 hits, short trailing snippet is full doc
    assert by[(2, 1)]["n_hits"] == 4 and by[(2, 1)]["snippet"] == "cat cat cat cat"
    assert (2, 2) not in by


def test_fragment_cap_and_tie_break(spark):
    # 3 tiles with equal hit counts → earliest tiles win, capped at 2
    d = spark.createDataFrame(
        [(7, "cat aa bb cc cat dd ee ff cat gg hh ii")], "doc_id long, text string")
    out = top_snippets(d, ["cat"], n_fragments=2, window=4).collect()
    assert [(r["frag_rank"], r["start"]) for r in
            sorted(out, key=lambda r: r["frag_rank"])] == [(1, 0), (2, 4)]


def test_single_fragment_agrees_with_best_snippet_count(spark, docs):
    """With one fragment, the top tile's hit count can't exceed the
    hit-anchored best window's (the anchored window is a superset search
    space), and both must flag the same matching docs."""
    a = {r["doc_id"]: r["n_hits"]
         for r in top_snippets(docs, ["cat"], 1, 4).collect()}
    b = {r["doc_id"]: r["n_hits"]
         for r in best_snippet(docs, ["cat"], 4).collect()}
    assert set(a) == set(b)
    assert all(a[d] <= b[d] for d in a)


def test_validates_params(spark, docs):
    with pytest.raises(ValueError):
        top_snippets(docs, [], 3, 4)
    with pytest.raises(ValueError):
        top_snippets(docs, ["x"], 0, 4)
    with pytest.raises(ValueError):
        top_snippets(docs, ["x"], 3, 0)
