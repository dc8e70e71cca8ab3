"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is production-shaped: explicit StructType schema,
Arrow-batched ``mapInPandas`` operators (decode → feature-extract → resize /
frame-sample), partition-preserving narrow plans. The actual media codecs
(PIL / libav) are NOT in this container, so the byte-level decode is a
clearly-marked deterministic stand-in (`_fake_decode`): it derives pixel
statistics from sha256 of the payload, so every downstream op is testable
and reproducible. Swap ``_decode_bytes`` for the real library behind the
same signature when available (import-try below).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),          # image | audio | video
    StructField("data", BinaryType(), False),           # opaque payload
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("codec", StringType(), True),
])


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets (no external data, FIXTURES rule)."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"asset{i}_{seed}".encode()).digest() * (1 + i % 4)
        rows.append((
            i, kind, bytearray(payload),
            64 + (i % 8) * 32 if kind != "audio" else None,
            48 + (i % 8) * 24 if kind != "audio" else None,
            16000 if kind == "audio" else None,
            int(1000 + (i % 10) * 500) if kind != "image" else None,
            {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        ))
        rng.random()
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_decode(data: bytes, width: int, height: int) -> tuple[float, float, int]:
    """Deterministic stand-in for image decode: (mean_px, std_px, n_px)
    derived from sha256(data) — NOT a real decoder (container lacks PIL)."""
    h = hashlib.sha256(bytes(data)).digest()
    mean = sum(h[:16]) / 16.0 / 255.0
    std = sum(abs(b - 128) for b in h[16:]) / 16.0 / 255.0
    return mean, std, int(width or 0) * int(height or 0)


DECODED_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("kind", StringType()),
    StructField("mean_px", DoubleType()),
    StructField("std_px", DoubleType()),
    StructField("n_px", LongType()),
])


def decode_stats(assets: DataFrame) -> DataFrame:
    """mapInPandas decode → per-asset pixel stats (Arrow batch iterator).
    Narrow: no shuffle; batch shape = arbitrary row slices per partition."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "kind", "mean_px", "std_px", "n_px")}
            for aid, kind, data, w, hgt in zip(
                pdf["asset_id"], pdf["kind"], pdf["data"], pdf["width"], pdf["height"]
            ):
                m, s, n = _fake_decode(data, w if pd.notna(w) else 0,
                                       hgt if pd.notna(hgt) else 0)
                out["asset_id"].append(int(aid))
                out["kind"].append(kind)
                out["mean_px"].append(m)
                out["std_px"].append(s)
                out["n_px"].append(n)
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, DECODED_SCHEMA)


FEATURE_DIM = 16
FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("feature", ArrayType(DoubleType())),
])


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic fake embedding per asset (sha-derived), real Arrow
    plumbing — the scale path for 'embed every image on the cluster'."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                h = hashlib.sha256(bytes(data)).digest()
                vec = [((h[i % 32] * 31 + i) % 255) / 255.0 - 0.5 for i in range(dim)]
                ids.append(int(aid))
                feats.append(vec)
            yield pd.DataFrame({"asset_id": ids, "feature": feats})

    return assets.select("asset_id", "data").mapInPandas(gen, FEATURE_SCHEMA)


def resize_image(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stub: recomputes metadata + re-keys payload deterministically.
    Real impl would transcode bytes; signature/schema are final."""
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("real PIL resize not wired in this container")
    images = assets.filter(F.col("kind") == "image")
    return images.withColumn("width", F.lit(target_w)).withColumn(
        "height", F.lit(target_h)
    ).withColumn("data", F.sha2(F.col("data"), 256).cast("binary"))


FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("ts_ms", LongType()),
    StructField("frame_sha", StringType()),
])


def sample_frames(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame sampling stub for video: one row per sampled timestamp with a
    deterministic frame fingerprint; the explode pattern (1 asset → n
    frames) matches the real decoder's output shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "frame_no", "ts_ms", "frame_sha")}
            for aid, kind, data, dur in zip(
                pdf["asset_id"], pdf["kind"], pdf["data"], pdf["duration_ms"]
            ):
                if kind != "video" or pd.isna(dur):
                    continue
                n = max(1, int(dur) // every_ms)
                for f in range(n):
                    out["asset_id"].append(int(aid))
                    out["frame_no"].append(f)
                    out["ts_ms"].append(f * every_ms)
                    out["frame_sha"].append(
                        hashlib.sha256(bytes(data) + f.to_bytes(4, "little")).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, FRAME_SCHEMA)
