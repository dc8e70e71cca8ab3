"""bench.py emission contract: the payload JSON must be the LAST stdout line.

Round 4's driver bench record was lost because Spark-teardown noise printed
after the payload (VERDICT r4 #1). bench.py --smoke runs a tiny registry
subset through the identical _emit_and_exit path; this test runs it as a
subprocess and asserts (a) the final stdout line parses as the payload JSON
and (b) the belt-and-suspenders artifact BENCH/last_run_smoke.json matches.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_smoke_bench_json_is_last_stdout_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "no stdout at all"
    # The contract the driver's tail-parse relies on: last line IS the JSON.
    payload = json.loads(lines[-1])
    assert payload["metric"] == "bench_suite_total"
    assert payload["unit"] == "sec"
    assert payload["smoke"] is True
    assert set(payload["queries"]) == {"topic_sizes", "events_hourly"}
    assert payload["value"] > 0
    with open(os.path.join(REPO, "BENCH", "last_run_smoke.json")) as f:
        persisted = json.load(f)
    assert persisted == payload
