"""Pointwise LTR training: GD trajectory vs a numpy reference (same
per-step rounding), loss decrease, degenerate features, rerank shape."""

import math

import pytest

from bertopic_spark.operators.ltr import (feature_stats, logreg_loss,
                                          logreg_rerank, logreg_train)


def _feats(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, f1 double, f2 double, label int")


@pytest.fixture(scope="module")
def synth(spark):
    # label follows f1 (plus a distractor f2 that is pure noise-by-id)
    rows = []
    for i in range(200):
        f1 = (i % 10) / 10.0
        f2 = ((i * 7) % 13) / 13.0
        rows.append((i % 4, i, f1, f2, 1 if f1 >= 0.5 else 0))
    return _feats(spark, rows).cache()


def test_matches_numpy_reference(spark, synth):
    cols = ["f1", "f2"]
    st = feature_stats(synth, cols)
    w = logreg_train(synth, "label", cols, iters=8, lr=0.7, l2=0.02,
                     stats=st)
    rows = synth.collect()
    X = [[1.0] + [
        0.0 if st[c][1] is None or st[c][1] <= 1e-12
        else (getattr(r, c) - st[c][0]) / st[c][1] for c in cols]
        for r in rows]
    y = [float(r.label) for r in rows]
    n = len(rows)
    ww = [0.0, 0.0, 0.0]
    for _ in range(8):
        gs = [0.0, 0.0, 0.0]
        for xi, yi in zip(X, y):
            m = sum(a * b for a, b in zip(ww, xi))
            p = 1.0 / (1.0 + math.exp(-m))
            for j in range(3):
                gs[j] += (p - yi) * xi[j]
        ww = [round(ww[0] - 0.7 * gs[0] / n, 9)] + [
            round(ww[j] - 0.7 * (gs[j] / n + 0.02 * ww[j]), 9)
            for j in (1, 2)]
    assert w == pytest.approx(ww, abs=2e-9)


def test_loss_decreases_and_separates(spark, synth):
    cols = ["f1", "f2"]
    st = feature_stats(synth, cols)
    losses = [logreg_loss(synth, "label", cols, [0.0, 0.0, 0.0], st)]
    for it in (3, 8, 15):
        w = logreg_train(synth, "label", cols, iters=it, stats=st)
        losses.append(logreg_loss(synth, "label", cols, w, st))
    assert all(b < a for a, b in zip(losses, losses[1:]))
    w = logreg_train(synth, "label", cols, iters=15, stats=st)
    assert w[1] > 1.0              # f1 drives the label
    assert abs(w[2]) < abs(w[1]) / 3   # distractor stays small


def test_constant_feature_is_inert(spark):
    rows = [(0, i, float(i % 2), 5.0, i % 2) for i in range(40)]
    f = _feats(spark, rows)
    st = feature_stats(f, ["f1", "f2"])
    assert st["f2"][1] <= 1e-12
    w = logreg_train(f, "label", ["f1", "f2"], iters=5, stats=st)
    assert w[2] == 0.0             # z=0 → never updated
    assert all(map(math.isfinite, w))


def test_rerank_shape_and_order(spark, synth):
    cols = ["f1", "f2"]
    st = feature_stats(synth, cols)
    w = logreg_train(synth, "label", cols, iters=10, stats=st)
    out = logreg_rerank(synth, cols, w, st, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.prob))
    for q, rows in by_q.items():
        rows.sort()
        assert [r for r, _ in rows] == list(range(1, len(rows) + 1))
        probs = [p for _, p in rows]
        assert probs == sorted(probs, reverse=True)


# ---------------------------------------------------------------------------
# Pairwise (RankNet) training
# ---------------------------------------------------------------------------

def test_ranknet_matches_numpy_reference(spark, synth):
    from bertopic_spark.operators.ltr import pairwise_diffs, ranknet_train
    cols = ["f1", "f2"]
    st = feature_stats(synth, cols)
    diffs = pairwise_diffs(synth, "label", cols, st,
                           max_pairs_per_query=50, seed=11).cache()
    w = ranknet_train(diffs, 2, iters=6, lr=0.8, l2=0.02)
    rows = diffs.collect()
    D = [[r.d1, r.d2] for r in rows]
    ww = [0.0, 0.0]
    for _ in range(6):
        gs = [0.0, 0.0]
        for d in D:
            m = sum(a * b for a, b in zip(ww, d))
            p = 1.0 / (1.0 + math.exp(-m))
            for j in range(2):
                gs[j] += (p - 1.0) * d[j]
        ww = [round(ww[j] - 0.8 * (gs[j] / len(D) + 0.02 * ww[j]), 9)
              for j in range(2)]
    assert w == pytest.approx(ww, abs=2e-9)
    assert w[0] > 0  # f1 separates the labels → positive pair margin


def test_pairwise_cap_and_determinism(spark, synth):
    from bertopic_spark.operators.ltr import pairwise_diffs
    cols = ["f1", "f2"]
    st = feature_stats(synth, cols)
    d1 = pairwise_diffs(synth, "label", cols, st, max_pairs_per_query=7)
    per_q = {r.query_id: 0 for r in d1.collect()}
    for r in d1.collect():
        per_q[r.query_id] += 1
    assert all(v <= 7 for v in per_q.values())
    d2 = pairwise_diffs(synth.repartition(9), "label", cols, st,
                        max_pairs_per_query=7)
    assert sorted(map(tuple, d1.collect())) == \
        sorted(map(tuple, d2.collect()))


def test_ranknet_rerank_orders_by_f1(spark, synth):
    from bertopic_spark.operators.ltr import (pairwise_diffs,
                                              ranknet_rerank, ranknet_train)
    cols = ["f1", "f2"]
    st = feature_stats(synth, cols)
    diffs = pairwise_diffs(synth, "label", cols, st)
    w = ranknet_train(diffs, 2, iters=12)
    out = ranknet_rerank(synth, cols, w, st, k=3).collect()
    feats = {(r.query_id, r.doc_id): r.f1 for r in synth.collect()}
    for r in out:
        if r.rank == 1:
            # the top-ranked doc per query has (near-)maximal f1
            best = max(v for (q, _), v in feats.items() if q == r.query_id)
            assert feats[(r.query_id, r.doc_id)] == pytest.approx(best)


def test_pairwise_side_cap_bounds_join_input(spark, synth):
    """The per-side md5 cap is applied BEFORE the pair join: with
    max_side_per_query=s the relation never exceeds s*s pairs per query
    (pre pair-cap), every id on each side comes from the capped set, and
    the result is still deterministic under repartitioning."""
    from bertopic_spark.operators.ltr import pairwise_diffs
    cols = ["f1", "f2"]
    st = feature_stats(synth, cols)
    s = 5
    d = pairwise_diffs(synth, "label", cols, st,
                       max_pairs_per_query=10_000, max_side_per_query=s)
    rows = d.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, {"pairs": 0, "pos": set(), "neg": set()})
        per_q[r.query_id]["pairs"] += 1
        per_q[r.query_id]["pos"].add(r.id_pos)
        per_q[r.query_id]["neg"].add(r.id_neg)
    # synth has 25 pos / 25 neg per query; with side cap 5 the join can
    # only see 5x5 = 25 pairs per query (pair cap is slack here)
    for q, st_ in per_q.items():
        assert st_["pairs"] == s * s
        assert len(st_["pos"]) == s and len(st_["neg"]) == s
    d2 = pairwise_diffs(synth.repartition(11), "label", cols, st,
                        max_pairs_per_query=10_000, max_side_per_query=s)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, d2.collect()))
    # a slack side cap (>= side sizes) reproduces the uncapped relation
    base = pairwise_diffs(synth, "label", cols, st, max_pairs_per_query=7,
                          max_side_per_query=1_000)
    old = pairwise_diffs(synth, "label", cols, st, max_pairs_per_query=7)
    assert sorted(map(tuple, base.collect())) == \
        sorted(map(tuple, old.collect()))
