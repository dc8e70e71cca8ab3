#!/usr/bin/env python
"""Append round-3 operator plans to BENCH/PLANS.md.

Captures `.explain("formatted")` for the paths added this round so the
plan-quality evidence stays current: the zero-shuffle run-length counting
mode (no Exchange anywhere before the output), the token-level
distribution's (doc, win) equi-join, the soft-assignment window normalize,
and the term-rank log floor (1-row broadcast, no second pass).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    from bertopic_spark.operators.ctfidf import ctfidf
    from bertopic_spark.operators.distribution import (
        approximate_distribution_tokens)
    from bertopic_spark.operators.postings import (class_term_counts,
                                                   doc_term_counts)
    from bertopic_spark.operators.viz import term_rank_curve
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    x = class_term_counts(
        doc_term_counts(docs, "text", ["lang", "doc_id"], "ascii_code"),
        ["lang"])
    scores = ctfidf(x, ["lang"])

    sections = []

    local = doc_term_counts(docs, "text", ["doc_id"], "ascii_code",
                            with_len=True, combine="local")
    p = plan_of(local)
    assert "Exchange" not in p, "combine='local' plan must have NO exchange"
    sections.append((
        "doc_term_counts(combine='local') — ZERO-shuffle per-doc counting",
        "Run-length over the sorted in-row token array (HOF lambda binding —\n"
        "the sort evaluates once per row). The physical plan contains no\n"
        "Exchange at all (asserted at capture time): scan → project →\n"
        "generate. This is the network-bound-cluster build path; the default\n"
        "shuffle plan's exchange moves |postings| rows.",
        p,
    ))

    sections.append((
        "approximate_distribution_tokens — window mass fan-out by (doc, win) join",
        "Window mass computes once per (doc, win, class) from the term view;\n"
        "the position view joins back on (doc_id, win_id) — an equi-join whose\n"
        "key contains the doc id, so candidates never cross documents. Both\n"
        "sides derive from ONE _window_structs projection of the same scan.",
        plan_of(approximate_distribution_tokens(
            docs, scores, ["lang"], "text", "doc_id", 4, 2)),
    ))

    sections.append((
        "term_rank_curve(log_scale=True) — 1-row floor broadcast into the expression",
        "The global min-positive-score floor is a 1-row aggregate broadcast\n"
        "(BroadcastNestedLoopJoin over a single row) into the log10 expression\n"
        "— no second pass over the top-k relation, no window.",
        plan_of(term_rank_curve(scores, ["lang"], 10, log_scale=True)),
    ))

    from bertopic_spark.model import BERTopicSpark

    m = BERTopicSpark(class_cols=["lang"]).fit(docs, "text", "doc_id")
    sections.append((
        "transform_distribution — sims agg + per-doc window normalize",
        "The pre-argmax sims relation (term join + (doc, class) agg) gets ONE\n"
        "additional window (partition key doc_id, well distributed) for the\n"
        "L1 normalize — the soft path costs one window more than argmax.",
        plan_of(m.transform_distribution(docs)),
    ))

    out = ["", "# Round-3 operator plans", ""]
    for title, blurb, plan in sections:
        out += [f"## {title}", "", blurb, "", "```", plan, "```", ""]
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n".join(out))
    print(f"appended {len(sections)} plans")


if __name__ == "__main__":
    main()
