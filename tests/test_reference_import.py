"""One-way import of a reference-saved model dir (S5 stretch, VERDICT r2
#10): hand-built safetensors CSR triplets + vocab + topics.json → long-form
state whose get_topics() matches the native fit term-for-term."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from bertopic_spark.model import BERTopicSpark
from bertopic_spark.sources.reference_model import (read_safetensors,
                                                    write_safetensors)

DOCS = [
    (0, 0, "spark table scan join filter"),
    (1, 0, "table scan merge spark spark"),
    (2, 1, "window batch stream stream"),
    (3, 1, "stream window checkpoint batch"),
    (4, 2, "vector cosine index probe"),
    (5, 2, "index vector bucket cosine cosine"),
]


def _export_reference_dir(model, tmpdir, outliers=0):
    """Write the model's scores_/stats_ exactly as the reference's
    safetensors serialization would (CSR row r ↔ topic r − _outliers,
    vocab term → column, idf diag)."""
    srows = model.scores_.select("topic", "term", "score").collect()
    irows = model.stats_.select("term", "idf").collect()
    vocab = {t: i for i, t in enumerate(sorted({r["term"] for r in srows}))}
    topics_sorted = sorted({r["topic"] for r in srows})
    tmap = {t: i for i, t in enumerate(topics_sorted)}
    by_row = {}
    for r in srows:
        by_row.setdefault(tmap[r["topic"]], []).append(
            (vocab[r["term"]], r["score"]))
    indptr, indices, data = [0], [], []
    for r in range(len(topics_sorted)):
        for c, v in sorted(by_row.get(r, [])):
            indices.append(c)
            data.append(v)
        indptr.append(len(indices))
    diag = np.zeros(len(vocab))
    for r in irows:
        diag[vocab[r["term"]]] = r["idf"]
    write_safetensors(os.path.join(tmpdir, "ctfidf.safetensors"), {
        "data": np.array(data, dtype=np.float32),   # reference saves f32
        "indices": np.array(indices, dtype=np.int64),
        "indptr": np.array(indptr, dtype=np.int64),
        "shape": np.array([len(topics_sorted), len(vocab)], dtype=np.int64),
        "diag": np.array(diag, dtype=np.float32),
    })
    with open(os.path.join(tmpdir, "ctfidf_config.json"), "w") as f:
        json.dump({"vectorizer_model": {"params": {}, "vocab": vocab},
                   "ctfidf_model": {"bm25_weighting": False,
                                    "reduce_frequent_words": False}}, f)
    sizes = {r["topic"]: r["count"] for r in model.get_topic_info()
             .select("topic", "count").collect()}
    with open(os.path.join(tmpdir, "topics.json"), "w") as f:
        json.dump({"topic_representations": {}, "topic_sizes": sizes,
                   "topic_labels": {}, "custom_labels": None,
                   "_outliers": outliers}, f)


def test_safetensors_roundtrip(tmp_path):
    t = {"a": np.arange(6, dtype=np.float64).reshape(2, 3),
         "b": np.array([1, 2, 3], dtype=np.int64)}
    p = str(tmp_path / "x.safetensors")
    write_safetensors(p, t)
    back = read_safetensors(p)
    assert set(back) == {"a", "b"}
    assert np.array_equal(back["a"], t["a"])
    assert np.array_equal(back["b"], t["b"])


def test_import_matches_native_get_topics(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, topic long, text string")
    native = BERTopicSpark(class_cols=["topic"]).fit(df, "text", "doc_id")
    _export_reference_dir(native, str(tmp_path))

    imported = BERTopicSpark.import_reference_model(spark, str(tmp_path))
    want = [(r["topic"], r["term"], round(r["score"], 5), r["rank"])
            for r in native.get_topics(5).orderBy("topic", "rank").collect()]
    got = [(r["topic"], r["term"], round(r["score"], 5), r["rank"])
           for r in imported.get_topics(5).orderBy("topic", "rank").collect()]
    assert got == want  # term-for-term (scores at f32 precision → 5dp)

    info = {r["topic"]: r["count"] for r in
            imported.get_topic_info().select("topic", "count").collect()}
    assert info == {0: 2, 1: 2, 2: 2}
    # idf diag came through
    idf = {r["term"]: r["idf"] for r in imported.stats_.collect()}
    assert len(idf) > 0 and all(v > 0 for v in idf.values())


def test_import_outlier_row_offset(spark, tmp_path):
    """_outliers=1 shifts CSR row 0 to topic −1 (reference convention)."""
    df = spark.createDataFrame(DOCS, "doc_id long, topic long, text string") \
        .withColumn("topic", F.col("topic") - 1)  # topics −1, 0, 1
    native = BERTopicSpark(class_cols=["topic"]).fit(df, "text", "doc_id")
    _export_reference_dir(native, str(tmp_path), outliers=1)
    imported = BERTopicSpark.import_reference_model(spark, str(tmp_path))
    got_topics = sorted(r["topic"] for r in
                        imported.scores_.select("topic").distinct().collect())
    assert got_topics == [-1, 0, 1]


def test_import_requires_safetensors_file(spark, tmp_path):
    with open(tmp_path / "topics.json", "w") as f:
        json.dump({}, f)
    with open(tmp_path / "ctfidf_config.json", "w") as f:
        json.dump({"vectorizer_model": {"vocab": {}},
                   "ctfidf_model": {}}, f)
    with pytest.raises(FileNotFoundError):
        BERTopicSpark.import_reference_model(spark, str(tmp_path))


def test_attach_corpus_enables_count_paths(spark, tmp_path):
    """S5 finish: import → attach_corpus → the count-reaggregation
    surfaces (topics_over_time, partial_fit, update_topics) run, and
    get_topics stays term-for-term with the imported scores."""
    df = spark.createDataFrame(DOCS, "doc_id long, topic long, text string") \
        .withColumn("ts", (F.col("doc_id") % 2).cast("long"))
    native = BERTopicSpark(class_cols=["topic"]).fit(df, "text", "doc_id")
    _export_reference_dir(native, str(tmp_path))
    imported = BERTopicSpark.import_reference_model(spark, str(tmp_path))

    # count paths are un-derivable from the artifact alone
    with pytest.raises(Exception):
        imported.topics_over_time("ts").collect()

    imported.attach_corpus(df, "text", "doc_id")
    # get_topics still answers from the imported scores, term-for-term
    want = [(r["topic"], r["term"], round(r["score"], 5), r["rank"])
            for r in native.get_topics(5).orderBy("topic", "rank").collect()]
    got = [(r["topic"], r["term"], round(r["score"], 5), r["rank"])
           for r in imported.get_topics(5).orderBy("topic", "rank").collect()]
    assert got == want
    # tf/df backfilled from the corpus (no NULLs on corpus terms)
    assert imported.scores_.filter("tf IS NULL").count() == 0
    assert imported.stats_.filter("df IS NULL").count() == 0

    # topics_over_time matches the native model's (same corpus, frozen
    # idf on both sides — scores imported at f32 → compare at 4dp)
    nat = [(r["ts"], r["topic"], r["term"], r["rank"])
           for r in native.topics_over_time("ts")
           .orderBy("ts", "topic", "rank").collect()]
    imp = [(r["ts"], r["topic"], r["term"], r["rank"])
           for r in imported.topics_over_time("ts")
           .orderBy("ts", "topic", "rank").collect()]
    assert imp == nat

    # partial_fit accumulates onto the attached state
    batch = spark.createDataFrame(
        [(10, 0, "spark spark join", 0), (11, 2, "cosine probe probe", 1)],
        "doc_id long, topic long, text string, ts long")
    imported.partial_fit(batch, "text", "doc_id")
    assert imported.get_topic_info().count() == 3
    sizes = {r["topic"]: r["count"]
             for r in imported.get_topic_info().collect()}
    assert sizes[0] >= 3  # grew by the batch

    # update_topics re-extracts with new params over the attached corpus
    imported2 = BERTopicSpark.import_reference_model(spark, str(tmp_path))
    imported2.attach_corpus(df, "text", "doc_id")
    imported2.update_topics(ngram_range=(1, 2))
    assert imported2.scores_.filter(F.col("term").contains(" ")).count() > 0


def test_attach_corpus_requires_class_column(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, topic long, text string")
    native = BERTopicSpark(class_cols=["topic"]).fit(df, "text", "doc_id")
    _export_reference_dir(native, str(tmp_path))
    imported = BERTopicSpark.import_reference_model(spark, str(tmp_path))
    with pytest.raises(ValueError, match="class column"):
        imported.attach_corpus(df.drop("topic"), "text", "doc_id")
