"""Team-draft interleaving: Spark draft == pure-Python reference
(overlap + exhaustion/fallback cases), partitioning invariance, click
credit arithmetic."""

import hashlib

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.evaluation import (interleave_credit,
                                                 team_draft_interleave)


def _rank_df(spark, d):
    rows = [(q, doc, r) for q, docs in d.items()
            for r, doc in enumerate(docs, 1)]
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def _py_draft(a, b, k, seed=17):
    out = {}
    for q in sorted(set(a) | set(b)):
        la, lb = list(a.get(q, [])), list(b.get(q, []))
        picked, res = set(), []
        for pos in range(1, k + 1):
            r = (pos + 1) // 2
            h = int(hashlib.md5(f"{seed}_{q}_{r}".encode())
                    .hexdigest()[:15], 16)
            first = "A" if (h + 0.5) / 16 ** 15 < 0.5 else "B"
            slated = first if pos % 2 == 1 else ("B" if first == "A"
                                                 else "A")
            pick = None
            for team, lst in ((slated, la if slated == "A" else lb),
                              ("B" if slated == "A" else "A",
                               lb if slated == "A" else la)):
                cand = [d for d in lst if d not in picked]
                if cand:
                    pick = (cand[0], team)
                    break
            if pick is None:
                break
            picked.add(pick[0])
            res.append((pos, pick[0], pick[1]))
        out[q] = res
    return out


CASES = [
    # disjoint lists
    ({0: [1, 2, 3, 4]}, {0: [11, 12, 13, 14]}, 8),
    # heavy overlap — forces consumption of shared docs
    ({1: [1, 2, 3, 4, 5]}, {1: [2, 1, 3, 6, 7]}, 10),
    # identical lists — one team exhausts, fallback fires
    ({2: [1, 2, 3]}, {2: [1, 2, 3]}, 6),
    # asymmetric lengths — B exhausts early
    ({3: [1, 2, 3, 4, 5, 6]}, {3: [1]}, 7),
]


@pytest.mark.parametrize("a,b,k", CASES)
def test_draft_matches_python_reference(spark, a, b, k):
    got = team_draft_interleave(_rank_df(spark, a), _rank_df(spark, b),
                                k_out=k).collect()
    want = _py_draft(a, b, k)
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r.query_id, []).append(
            (r.pos, r.doc_id, r.team))
    for q in want:
        assert sorted(got_by_q.get(q, [])) == want[q], (q, a, b)


def test_partitioning_invariance(spark):
    a = {q: [q * 10 + i for i in range(5)] for q in range(6)}
    b = {q: [q * 10 + i for i in range(2, 9)] for q in range(6)}
    ra, rb = _rank_df(spark, a), _rank_df(spark, b)
    g1 = sorted(map(tuple, team_draft_interleave(ra, rb, 8).collect()))
    g2 = sorted(map(tuple, team_draft_interleave(
        ra.repartition(7), rb.repartition(3), 8).collect()))
    assert g1 == g2


def test_credit_and_winner(spark):
    inter = spark.createDataFrame(
        [(0, 1, 100, "A"), (0, 2, 101, "B"), (0, 3, 102, "A"),
         (1, 1, 200, "B"), (1, 2, 201, "A"),
         (2, 1, 300, "A"), (2, 2, 301, "B")],
        "query_id long, pos int, doc_id long, team string")
    clicks = spark.createDataFrame(
        [(0, 100), (0, 102), (0, 101), (1, 200), (2, 300), (2, 301),
         (2, 300)],  # duplicate click deduped
        "query_id long, doc_id long")
    got = {r.query_id: (r.clicks_a, r.clicks_b, r.winner)
           for r in interleave_credit(inter, clicks).collect()}
    assert got[0] == (2, 1, "A")
    assert got[1] == (0, 1, "B")
    assert got[2] == (1, 1, "tie")


def test_no_clicks_is_tie(spark):
    inter = spark.createDataFrame([(0, 1, 100, "A")],
                                  "query_id long, pos int, doc_id long, team string")
    clicks = spark.createDataFrame([], "query_id long, doc_id long")
    got = interleave_credit(inter, clicks).collect()
    assert got[0].winner == "tie" and got[0].clicks_a == 0


# ---------------------------------------------------------------------------
# Paired t-test between rankers
# ---------------------------------------------------------------------------

def test_paired_ttest_hand_math(spark):
    from bertopic_spark.operators.evaluation import paired_ttest
    a = spark.createDataFrame([(0, 0.9), (1, 0.8), (2, 0.7), (3, 0.95)],
                              "query_id long, m double")
    b = spark.createDataFrame([(0, 0.85), (1, 0.82), (2, 0.6), (3, 0.9)],
                              "query_id long, m double")
    r = paired_ttest(a, b, "m").collect()[0]
    deltas = [0.05, -0.02, 0.1, 0.05]
    n = len(deltas)
    mean = sum(deltas) / n
    var = sum((d - mean) ** 2 for d in deltas) / (n - 1)
    sd = var ** 0.5
    assert r.n == 4 and r.df == 3
    assert r.mean_delta == pytest.approx(mean, abs=1e-12)
    assert r.sd_delta == pytest.approx(sd, abs=1e-12)
    assert r.t_stat == pytest.approx(mean / (sd / n ** 0.5), abs=1e-9)


def test_paired_ttest_degenerate(spark):
    from bertopic_spark.operators.evaluation import paired_ttest
    a = spark.createDataFrame([(0, 0.5), (1, 0.6)], "query_id long, m double")
    b = spark.createDataFrame([(0, 0.4), (1, 0.5)], "query_id long, m double")
    r = paired_ttest(a, b, "m").collect()[0]   # constant delta → sd 0
    assert r.sd_delta == pytest.approx(0.0, abs=1e-12)
    assert r.t_stat is None
    one = paired_ttest(a.limit(1), b.limit(1), "m").collect()[0]
    assert one.n == 1 and one.t_stat is None
