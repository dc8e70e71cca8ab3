"""Import a reference-saved BERTopic model directory into long-form state.

The reference persists a fitted model as (``bertopic/_save_utils.py:44-52``,
reconstruction at ``_bertopic.py:5097-5117``):

* ``topics.json``         — topic_representations / topics / topic_sizes /
                            topic_labels / custom_labels / _outliers
* ``ctfidf_config.json``  — CountVectorizer params + vocab (term → column),
                            ClassTfidfTransformer flags
* ``ctfidf.safetensors``  — CSR triplets of ``c_tf_idf_`` (data, indices,
                            indptr, shape) + ``diag`` (the idf diagonal)

Row i of the CSR corresponds to topic ``i − _outliers`` (the reference
rebuilds the matrix with that implicit ordering). This module reads those
artifacts — safetensors is a PUBLIC trivially-parseable format (8-byte LE
header length, JSON header with per-tensor dtype/shape/data_offsets, raw
little-endian buffers), so no third-party package is needed — and emits the
engine's long-form relations: scores (topic, term, tf, score), stats
(term, df, idf), sizes (topic, count).

``tf`` and ``df`` are NOT stored by the reference format; they import as
NULL. Every score-driven query surface (get_topics, find_topics, merge,
hierarchy, transform) works immediately; count-reaggregation paths
(topics_over_time, topics_per_class, partial_fit, update_topics) come
back after ``BERTopicSpark.attach_corpus(docs)`` reattaches the fitted
corpus — the only faithful source of class-term counts — which backfills
tf/df while keeping the imported idf and scores untouched.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

_DTYPES = {
    "F64": "<f8", "F32": "<f4", "F16": "<f2",
    "I64": "<i8", "I32": "<i4", "I16": "<i2", "I8": "i1",
    "U64": "<u8", "U32": "<u4", "U16": "<u2", "U8": "u1",
    "BOOL": "?",
}
_INV_DTYPES = {"float64": "F64", "float32": "F32", "int64": "I64",
               "int32": "I32", "uint8": "U8", "bool": "BOOL"}


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Minimal reader for the public safetensors layout."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode("utf-8"))
        blob = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        s, e = meta["data_offsets"]
        arr = np.frombuffer(blob[s:e], dtype=_DTYPES[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"])
    return out


def write_safetensors(path: str, tensors: dict[str, np.ndarray]) -> None:
    """Minimal writer (test fixtures; same public layout)."""
    header: dict[str, Any] = {}
    bufs, off = [], 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        raw = arr.tobytes()
        header[name] = {"dtype": _INV_DTYPES[str(arr.dtype)],
                        "shape": list(arr.shape),
                        "data_offsets": [off, off + len(raw)]}
        bufs.append(raw)
        off += len(raw)
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for b in bufs:
            f.write(b)


def load_reference_dir(spark, path: str, topic_col: str = "topic"):
    """Read a reference-saved model dir → a fitted ``BERTopicSpark`` whose
    score-driven query surface answers from the imported state."""
    from bertopic_spark.model import BERTopicSpark

    with open(os.path.join(path, "topics.json")) as f:
        topics = json.load(f)
    with open(os.path.join(path, "ctfidf_config.json")) as f:
        cfg = json.load(f)
    st = os.path.join(path, "ctfidf.safetensors")
    if not os.path.exists(st):
        raise FileNotFoundError(
            f"{st} not found — only safetensors serialization is supported "
            "(the pytorch pickle variant needs torch, absent here)")
    t = read_safetensors(st)

    vocab: dict[str, int] = cfg["vectorizer_model"]["vocab"]
    terms = np.empty(len(vocab), dtype=object)
    for w, i in vocab.items():
        terms[int(i)] = w
    outliers = int(topics.get("_outliers", 0))
    indptr = t["indptr"].astype(np.int64)
    indices = t["indices"].astype(np.int64)
    data = t["data"].astype(np.float64)
    n_rows = int(t["shape"][0])

    rows = []
    for r in range(n_rows):
        topic = r - outliers
        for p in range(int(indptr[r]), int(indptr[r + 1])):
            rows.append((topic, str(terms[indices[p]]), float(data[p])))
    scores = spark.createDataFrame(
        rows, f"{topic_col} long, term string, score double"
    ).withColumn("tf", _null_long()).select(topic_col, "term", "tf", "score")

    diag = t["diag"].astype(np.float64)
    stats = spark.createDataFrame(
        [(str(terms[i]), float(diag[i])) for i in range(len(diag))],
        "term string, idf double",
    ).withColumn("df", _null_long()).select("term", "df", "idf")

    m = BERTopicSpark(
        class_cols=[topic_col],
        bm25_weighting=bool(cfg["ctfidf_model"].get("bm25_weighting", False)),
        reduce_frequent_words=bool(
            cfg["ctfidf_model"].get("reduce_frequent_words", False)),
    )
    m.scores_ = scores.persist()
    m.stats_ = stats.persist()
    m.custom_labels_ = topics.get("custom_labels") or None
    sizes = topics.get("topic_sizes") or {}
    m._imported_sizes = spark.createDataFrame(
        [(int(k), int(v)) for k, v in sizes.items()],
        f"{topic_col} long, count long") if sizes else None
    return m


def _null_long():
    from pyspark.sql import functions as F

    return F.lit(None).cast("long")
