"""reduce_topics(nr_topics="auto"): deterministic distance-threshold cut of
the single-linkage tree (reference _auto_reduce_topics analog,
`_bertopic.py:4629-4672`), outlier topic pinned."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.model import BERTopicSpark

LANG_TOPIC = {"en": 0, "zh": 1, "es": 2, "de": 3, "fr": 4}


@pytest.fixture()
def fitted(documents_df):
    m = F.create_map(*[F.lit(x) for kv in LANG_TOPIC.items() for x in kv])
    d = documents_df.withColumn("topic", m[F.col("lang")].cast("long"))
    return BERTopicSpark(class_cols=["topic"]).fit(d, "text", "doc_id")


def test_auto_threshold_one_merges_everything(fitted):
    k0 = fitted.scores_.select("topic").distinct().count()
    assert k0 == len(LANG_TOPIC)
    fitted.reduce_topics("auto", distance_threshold=1.0)
    left = [r[0] for r in fitted.scores_.select("topic").distinct().collect()]
    assert left == [0]  # everything collapses into the smallest topic id
    assert fitted.get_mappings()  # lineage recorded


def test_auto_threshold_zero_is_noop(fitted):
    before = fitted.scores_
    out = fitted.reduce_topics("auto", distance_threshold=0.0)
    assert out is fitted and fitted.scores_ is before
    assert not fitted.mappings_


def test_auto_outlier_never_merges(documents_df):
    m = F.create_map(*[F.lit(x) for kv in LANG_TOPIC.items() for x in kv])
    d = documents_df.withColumn(
        "topic",
        F.when(F.col("doc_id") % 7 == 0, F.lit(-1))
        .otherwise(m[F.col("lang")]).cast("long"))
    model = BERTopicSpark(class_cols=["topic"]).fit(d, "text", "doc_id")
    model.reduce_topics("auto", distance_threshold=1.0)
    left = sorted(r[0] for r in
                  model.scores_.select("topic").distinct().collect())
    assert left == [-1, 0]
    assert -1 not in model.get_mappings()
    assert all(v != -1 for v in model.get_mappings().values())
