"""token_windows parity with the reference's window/stride/padding loop
(`_bertopic.py:1318-1351`), oracle-by-reimplementation in pure Python."""

import math

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.distribution import token_windows


def _ref_windows(tokens, window, stride, padding):
    """Direct transcription of the reference tokenset loop."""
    if len(tokens) < window:
        out = [list(tokens)]
    else:
        out = []
        for si in range(0, len(tokens), stride):
            sel = tokens[si:si + window]
            if padding or len(sel) == window:
                out.append(sel)
        if padding:
            t = math.ceil(window / stride) - 1
            padded = [tokens[:window - (t - i) * stride] for i in range(t)]
            out = padded + out
    return [w for w in out if w]  # empty pads join to "" → no terms


DOCS = [
    (0, "aa bb cc dd ee ff gg"),
    (1, "aa bb cc"),
    (2, "aa"),
    (3, "aa bb cc dd ee ff gg hh ii"),
    (4, ""),
]


@pytest.mark.parametrize("window,stride,padding", [
    (4, 1, False), (4, 2, False), (4, 3, False), (5, 2, False),
    (4, 1, True), (4, 2, True), (4, 3, True), (5, 2, True), (6, 4, True),
])
def test_token_windows_matches_reference(spark, window, stride, padding):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        token_windows(df, "text", "doc_id", window, stride, "ascii_code", padding)
        .groupBy("doc_id", "win_id")
        .agg(F.collect_list("term").alias("terms"))
        .collect()
    )
    spark_wins = {}
    for r in got:
        spark_wins.setdefault(r["doc_id"], {})[r["win_id"]] = r["terms"]
    for doc_id, text in DOCS:
        toks = text.split()
        want = _ref_windows(toks, window, stride, padding)
        have = spark_wins.get(doc_id, {})
        assert len(have) == len(want), (doc_id, want, have)
        # win_id order must match the reference's list order (pads first);
        # within-window order is a bag (scoring is order-insensitive)
        ordered = [sorted(have[k]) for k in sorted(have)]
        assert ordered == [sorted(w) for w in want], (doc_id, want, ordered)
