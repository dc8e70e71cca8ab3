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


def _ref_token_sets(tokens, window, stride, padding):
    """Reference tokenset loop WITH token-position ids
    (`_bertopic.py:1316-1351`: token_sets + token_sets_ids)."""
    if len(tokens) < window:
        out = [(list(tokens), list(range(len(tokens))))]
    else:
        out = []
        for si in range(0, len(tokens), stride):
            sel = tokens[si:si + window]
            if padding or len(sel) == window:
                out.append((sel, list(range(si, si + len(sel)))))
        if padding:
            t = math.ceil(window / stride) - 1
            padded = [(tokens[:window - (t - i) * stride],
                       list(range(0, window - (t - i) * stride)))
                      for i in range(t)]
            out = padded + out
    return [(w, ids) for w, ids in out if w]


SCORES = {  # (class, term) -> score; ee..ii deliberately unscored (sparse)
    ("c1", "aa"): 1.0, ("c1", "bb"): 0.5, ("c1", "cc"): 0.25,
    ("c1", "dd"): 2.0,
    ("c2", "aa"): 0.75, ("c2", "dd"): 1.5,
}


@pytest.mark.parametrize("window,stride,padding", [
    (4, 2, False), (4, 1, True), (4, 2, True), (5, 2, True),
])
def test_token_distribution_matches_reference(spark, window, stride, padding):
    """approximate_distribution_tokens parity with the reference token
    accumulation (`_bertopic.py:1374-1404`): each token position sums the
    mass of every window containing it, per class, unnormalized."""
    from bertopic_spark.operators.distribution import (
        approximate_distribution_tokens)

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sdf = spark.createDataFrame(
        [(c, t, s) for (c, t), s in SCORES.items()],
        "lang string, term string, score double")
    got = approximate_distribution_tokens(
        df, sdf, ["lang"], "text", "doc_id", window, stride,
        "ascii_code", padding).collect()
    have = {(r["doc_id"], r["token_pos"], r["lang"]):
            (r["term"], round(r["weight"], 9)) for r in got}
    want = {}
    for doc_id, text in DOCS:
        toks = text.split()
        for win, ids in _ref_token_sets(toks, window, stride, padding):
            mass = {}
            for cls in ("c1", "c2"):
                m = sum(SCORES.get((cls, t), 0.0) for t in win)
                if any((cls, t) in SCORES for t in win):
                    mass[cls] = m
            for pos in ids:
                for cls, m in mass.items():
                    k = (doc_id, pos, cls)
                    term, acc = want.get(k, (toks[pos], 0.0))
                    want[k] = (term, acc + m)
    want = {k: (t, round(v, 9)) for k, (t, v) in want.items()}
    assert have == want


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


def test_stratified_sample_deterministic_and_nested(spark):
    import hashlib

    import pytest as _pytest
    from bertopic_spark.operators.distribution import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r.doc_id, r.lang) for r in docs.select("doc_id", "lang").collect()]
    fr = {"en": 0.5, "de": 0.1}
    got = sorted(r.doc_id for r in
                 stratified_sample(docs, "lang", fr, default=0.02).collect())

    def u(d):
        h = hashlib.md5(f"42_{d}".encode()).hexdigest()[:15]
        return int(h, 16) / 16 ** 15

    want = sorted(d for d, lg in rows if u(d) < fr.get(lg, 0.02))
    assert got == want and got
    # nested: raising a fraction only adds rows
    a = {r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.3}).collect()}
    b = {r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.6}).collect()}
    assert a <= b and len(a) < len(b)
    with _pytest.raises(ValueError):
        stratified_sample(docs, "lang", {"en": 1.5})


def test_weighted_sample_wor(spark):
    """Efraimidis-Spirakis properties: determinism, weight-domination,
    zero-weight exclusion, per-group cap, and a python oracle replay."""
    import hashlib

    from bertopic_spark.operators.distribution import weighted_sample_wor

    rows = [(i, "g" + str(i % 3), float(1 + (i * 7) % 50)) for i in range(200)]
    rows.append((900, "g0", 0.0))       # zero weight: excluded
    rows.append((901, "g1", -3.0))      # negative: excluded
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")

    got = weighted_sample_wor(df, "w", 20, seed=7)
    ids = [r.doc_id for r in got.collect()]
    assert len(ids) == 20 and 900 not in ids and 901 not in ids
    # deterministic: second run identical
    assert [r.doc_id for r in weighted_sample_wor(df, "w", 20, seed=7)
            .collect()] == ids

    # python oracle: same key formula, top-20
    def key(i, w):
        h = int(hashlib.md5(f"7_{i}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(16 ** 15 + 1)
        return math.log(u) / w

    exp = sorted(((key(i, w), i) for i, _, w in rows if w > 0),
                 key=lambda t: (-t[0], t[1]))[:20]
    assert sorted(ids) == sorted(i for _, i in exp)

    # a huge-weight row is (effectively) always included
    df2 = df.union(spark.createDataFrame([(999, "g2", 1e12)], df.schema))
    assert 999 in [r.doc_id for r in
                   weighted_sample_wor(df2, "w", 5, seed=7).collect()]

    # per-group: exactly n rows per group, subset of that group's ranking
    per = weighted_sample_wor(df, "w", 4, seed=7, by=["grp"])
    counts = {r.grp: r.n for r in
              per.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 4, "g1": 4, "g2": 4}


def test_diversified_sampler(spark):
    import hashlib

    from bertopic_spark.operators.distribution import diversified_sampler

    rows = [(i, "heavy" if i < 40 else f"tail{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    got = diversified_sampler(df, "lang", n=12, max_docs_per_value=3,
                              id_col="doc_id", seed=42).collect()
    assert len(got) == 12
    langs = [r.lang for r in got]
    assert langs.count("heavy") == 3  # cap binds on the dominant value
    # deterministic replay: python md5 with the same key convention
    u = {i: hashlib.md5(f"42_{i}".encode()).hexdigest() for i in range(50)}
    per = {}
    survivors = []
    for i in sorted(range(50), key=lambda i: (u[i], i)):
        lang = rows[i][1]
        per[lang] = per.get(lang, 0) + 1
        if per[lang] <= 3:
            survivors.append(i)
    expect = sorted(sorted(survivors, key=lambda i: (u[i], i))[:12])
    assert sorted(r.doc_id for r in got) == expect
    # second run identical (no RNG state)
    again = diversified_sampler(df, "lang", n=12, max_docs_per_value=3,
                                id_col="doc_id", seed=42).collect()
    assert sorted(r.doc_id for r in again) == expect
