"""visualize_* facade parity: each method returns the DATA relation the
reference's plotly figure draws (reference `_bertopic.py:2541-3472`,
``bertopic/plotting/``; the drawing itself is presentation code, SURVEY §0).
"""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.model import BERTopicSpark
from bertopic_spark.operators.viz import hierarchy_level_assignments

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb_df(spark):
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select(F.col("vec_id").alias("doc_id"), "embedding").cache())


@pytest.fixture(scope="module")
def vmodel(documents_df, emb_df):
    return BERTopicSpark(class_cols=["lang"], top_n_words=10).fit(
        documents_df, text_col="text", id_col="doc_id", embeddings=emb_df)


def test_visualize_topics_relation(vmodel, documents_df):
    rows = vmodel.visualize_topics().collect()
    langs = {r[0] for r in documents_df.select("lang").distinct().collect()}
    assert {r["lang"] for r in rows} == langs
    assert sum(r["count"] for r in rows) == documents_df.count()
    assert all(r["label"] for r in rows)
    assert all(r["x"] is not None and r["y"] is not None for r in rows)


def test_visualize_heatmap_triangle(vmodel):
    rows = vmodel.visualize_heatmap().collect()
    k = vmodel.scores_.select("lang").distinct().count()
    assert len(rows) <= k * (k - 1) // 2
    assert all(r["lang_a"] < r["lang_b"] for r in rows)
    assert all(-1e-9 <= r["sim"] <= 1 + 1e-9 for r in rows)


def test_visualize_barchart_topn(vmodel):
    rows = vmodel.visualize_barchart(top_n_topics=2, n_words=4).collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["rank"])
    assert len(per) == 2
    assert all(sorted(v) == [1, 2, 3, 4] for v in per.values())
    # the 2 kept topics are the largest by size
    freq = {r["lang"]: r["count"] for r in vmodel.get_topic_freq().collect()}
    kept_min = min(freq[lang] for lang in per)
    assert kept_min >= max(v for lang, v in freq.items() if lang not in per)


def test_visualize_term_rank_aliases_term_rank_data(vmodel):
    a = sorted(map(tuple, vmodel.visualize_term_rank().collect()))
    b = sorted(map(tuple, vmodel.term_rank_data().collect()))
    assert a == b


def test_visualize_hierarchy_rows(vmodel):
    k = vmodel.scores_.select("lang").distinct().count()
    assert vmodel.visualize_hierarchy().count() == k - 1


def test_visualize_documents_scatter(vmodel, documents_df):
    rows = vmodel.visualize_documents().collect()
    assert len(rows) == documents_df.count()
    r0 = rows[0].asDict()
    for col in ("doc_id", "x", "y", "lang", "label"):
        assert col in r0
    # datamap variant is the same relation
    assert vmodel.visualize_document_datamap().count() == len(rows)


def test_visualize_documents_requires_embeddings(documents_df):
    m = BERTopicSpark(class_cols=["lang"]).fit(documents_df, "text", "doc_id")
    with pytest.raises(ValueError, match="embeddings"):
        m.visualize_documents()


def test_visualize_hierarchical_documents_levels(vmodel, documents_df):
    out = vmodel.visualize_hierarchical_documents(nr_levels=3)
    rows = out.collect()
    k = vmodel.scores_.select("lang").distinct().count()
    levels = sorted({r["level"] for r in rows})
    assert levels[-1] == k - 1  # the final cut is always included
    n = documents_df.count()
    assert len(rows) == n * len(levels)
    # at the last merge every doc collapses into ONE topic: the smallest class
    top = {r["topic"] for r in rows if r["level"] == k - 1}
    classes = [r[0] for r in vmodel.scores_.select("lang").distinct().collect()]
    assert top == {min(classes)}
    # coords come from the fit() embeddings
    assert {"x", "y"} <= set(out.columns)


def test_visualize_distribution_threshold(vmodel, documents_df):
    probs = vmodel.transform_distribution(
        documents_df.filter(F.col("doc_id") < 5), "text", "doc_id")
    out = vmodel.visualize_distribution(probs, min_probability=0.1).collect()
    assert all(r["prob"] >= 0.1 for r in out)
    assert all(r["label"] for r in out)
    full = probs.filter(F.col("prob") >= 0.1).count()
    assert len(out) == full


def test_visualize_approximate_distribution_tokens(vmodel, documents_df):
    out = vmodel.visualize_approximate_distribution(
        documents_df.filter(F.col("doc_id") < 3))
    assert {"token_pos", "term", "weight"} <= set(out.columns)
    assert out.count() > 0


def test_visualize_topics_over_time_filters(documents_df):
    m2 = BERTopicSpark(class_cols=["lang"]).fit(
        documents_df.withColumn("slice", F.col("doc_id") % 2), "text", "doc_id")
    rel = m2.topics_over_time("slice", k=2)
    some = [r["lang"] for r in m2.get_topic_freq().collect()][:2]
    got = m2.visualize_topics_over_time(rel, topics=some).collect()
    assert {r["lang"] for r in got} <= set(some)
    got2 = m2.visualize_topics_per_class(rel, top_n_topics=1).collect()
    assert len({r["lang"] for r in got2}) == 1


def test_hierarchy_level_assignments_unit(spark):
    """Hand-built 4-leaf tree: (0,1) merge first, then (0,1)+2, then +3."""
    hier = spark.createDataFrame(
        [(4, 0, 1, 0.1, "0,1"), (5, 4, 2, 0.2, "0,1,2"),
         (6, 5, 3, 0.3, "0,1,2,3")],
        "parent_id long, child_left long, child_right long, "
        "distance double, topics string")
    out = hierarchy_level_assignments(hier, 4, [1, 2, 3]).collect()
    got = {(r["level"], r["leaf"]): r["topic_at_level"] for r in out}
    assert got == {
        (1, 0): 0, (1, 1): 0, (1, 2): 2, (1, 3): 3,
        (2, 0): 0, (2, 1): 0, (2, 2): 0, (2, 3): 3,
        (3, 0): 0, (3, 1): 0, (3, 2): 0, (3, 3): 0,
    }
