"""Driver-contract plumbing tests for bench.py (CPU, no metrics run).

The driver parses the LAST stdout line of `python bench.py` and records
the tail of the artifact; these pin the self-certification contract
(round 5): a run always ends with valid JSON, an all-skip wedge run
reports an explicit null (never a zero that reads like a measured 0
tok/s), and the penultimate summary enumerates what landed.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_skip_run_ends_with_null_summary():
    env = dict(os.environ)
    env["BENCH_PLATFORM"] = "cpu"
    env["BENCH_ONLY_METRICS"] = "no_such_metric"
    env["BENCH_DEADLINE_SECS"] = "60"
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout
    last = json.loads(lines[-1])
    assert last["metric"] == "bench_summary"
    assert last["value"] is None          # nothing landed -> null, not 0
    assert last["landed"] == {}
    assert last["critical_landed"] == []
