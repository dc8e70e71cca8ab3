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
