"""Scale-dependent correctness (VERDICT r3 #5): replay the driver-sampled
gate set against DuckDB at sf0.1 — ten times the data the regular replay
uses — to catch bucket-boundary, overflow, and skew-path bugs before the
driver does. Marked slow; deselect with -m "not slow"."""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"

# the driver's round-3 sample, plus this round's new gates — refresh when
# a new CORRECTNESS_r*.json lands
_R03 = os.path.join(REPO, "CORRECTNESS_r03.json")
SAMPLE = sorted(json.load(open(_R03))) if os.path.exists(_R03) else []
SAMPLE += ["dedup_containment", "dedup_containment_boiler",
           "numeric_histogram", "interval_overlap_pairs", "rank_eval_err",
           "rank_feature_topk"]


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 testdata absent")
def test_driver_sample_matches_oracle_at_sf01(spark):
    import sys
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import oracle_crosscheck as oc

    con = oc.duckdb_con(SF01)
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    failed = []
    for name in SAMPLE:
        if name not in qs:
            continue
        spdf = qs[name](spark, SF01).toPandas()
        errs = oc.compare(name, spdf, con.sql(osql[name]).df())
        if errs:
            failed.append((name, errs))
    assert not failed, failed
