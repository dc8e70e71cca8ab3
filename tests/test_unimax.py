"""UniMax domain-mixing invariants: exact budget consumption, per-domain
epoch caps, uniformity of the water level, clamping when the budget
exceeds total capacity."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.pipeline import unimax_plan, unimax_select


@pytest.fixture(scope="module")
def docs(spark):
    rows = ([(i, "a") for i in range(10)] +
            [(100 + i, "b") for i in range(50)] +
            [(500 + i, "c") for i in range(200)])
    return spark.createDataFrame(rows, "doc_id long, dom string")


def test_plan_waterfills_exact_budget(docs):
    plan = unimax_plan(docs, "dom", budget=120, max_epochs=2.0)
    alloc = {d: a for d, n, c, a in plan}
    # caps: a=20, b=100, c=400; equal share 40 -> a capped at 20,
    # remaining 100 over 2 domains -> 50 each
    assert alloc == {"a": 20, "b": 50, "c": 50}
    assert sum(alloc.values()) == 120


def test_plan_clamps_to_total_capacity(docs):
    plan = unimax_plan(docs, "dom", budget=10_000, max_epochs=1.0)
    assert {d: a for d, n, c, a in plan} == {"a": 10, "b": 50, "c": 200}


def test_plan_remainder_distribution(docs):
    # budget 121: a capped 20, remaining 101 over 2 -> 50 each + 1 extra
    # to the first uncapped domain in (cap, domain) order (b)
    plan = unimax_plan(docs, "dom", budget=121, max_epochs=2.0)
    alloc = {d: a for d, n, c, a in plan}
    assert alloc == {"a": 20, "b": 51, "c": 50}


def test_select_copies_match_alloc(docs):
    sel = unimax_select(docs, "dom", budget=120, max_epochs=2.0,
                        id_col="doc_id")
    per = {r["domain"]: (r["s"], r["mx"]) for r in
           sel.groupBy("domain").agg(F.sum("n_copies").alias("s"),
                                     F.max("n_copies").alias("mx"))
           .collect()}
    assert {d: s for d, (s, _) in per.items()} == {
        "a": 20, "b": 50, "c": 50}
    # epoch cap: no doc repeats more than ceil(max_epochs) times
    assert all(mx <= 2 for _, mx in per.values())


def test_select_deterministic(docs):
    a = sorted(map(tuple, unimax_select(docs, "dom", 120, 2.0).collect()))
    b = sorted(map(tuple, unimax_select(docs, "dom", 120, 2.0).collect()))
    assert a == b


def test_validation(docs):
    with pytest.raises(ValueError):
        unimax_plan(docs, "dom", budget=0)
    with pytest.raises(ValueError):
        unimax_plan(docs, "dom", budget=10, max_epochs=0)
