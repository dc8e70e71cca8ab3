"""COVERAGE.md ↔ registry sync gate (VERDICT r4 #5).

jobs/gen_coverage.py is run manually; this test fails the suite whenever a
gate lands in ``__spark_entry__.queries()`` without regenerating the
catalog (or a gate is removed and the stale row lingers), so the two can
never drift the way they did in round 4 (265 rows vs a 277-gate registry).
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _catalog_gate_names() -> set[str]:
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    body = text.split("## Gate catalog", 1)[1]
    names = set()
    for line in body.splitlines():
        m = re.match(r"\| ([a-z0-9_]+) \| ", line)
        if m and m.group(1) != "gate":
            names.add(m.group(1))
    return names


def test_coverage_catalog_matches_registry():
    import __spark_entry__ as e

    registry = set(e.queries())
    catalog = _catalog_gate_names()
    missing = sorted(registry - catalog)
    stale = sorted(catalog - registry)
    assert not missing and not stale, (
        f"COVERAGE.md out of sync — run `python jobs/gen_coverage.py`. "
        f"missing rows: {missing[:10]}; stale rows: {stale[:10]}")


def test_coverage_gate_count_header():
    import __spark_entry__ as e

    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        body = f.read().split("## Gate catalog", 1)[1]
    m = re.search(r"(\d+) oracle gates", body)
    assert m and int(m.group(1)) == len(e.queries())
