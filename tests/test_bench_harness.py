"""Bench-harness robustness: the bench must emit its one-line JSON even
when a headline query throws (r3 lost every timing to one analysis
exception — a harness that cannot measure under partial failure is
itself a correctness bug)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_survives_injected_query_failure():
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            # same dir → warm-up phase skipped, keeps the test fast
            "SPARK_GRAFT_WARM_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_CPUS": "8",
            "SPARK_GRAFT_BENCH_INJECT_ERROR": "q1_pricing_summary",
        }
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "headline_queries_total_sec"
    # the injected query is reported as an error, not a crash
    assert "q1_pricing_summary" in out.get("errors", {})
    assert "injected bench failure" in out["errors"]["q1_pricing_summary"]
    # every OTHER headline query still produced a timing
    assert len(out["queries"]) >= 10
    assert "q1_pricing_summary" not in out["queries"]


def test_fences_only_fire_at_their_own_scale():
    """sf0.001 run: BASELINE_QUERIES is pinned at sf0.1, so the JSON
    must carry fences_skipped (never a mislabeled regressions key) —
    the r11 BENCH_sf1.json artifact read as a regression report that
    was really a data-size difference."""
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_WARM_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_CPUS": "8",
            "SPARK_GRAFT_BENCH_REPEATS": "1",
        }
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["sf"] == 0.001
    assert "regressions" not in out
    assert "fence_sf" not in out
    assert "sf0.1" in out["fences_skipped"]
