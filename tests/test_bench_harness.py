"""Bench-harness contract: the bench must emit its one-line JSON even
when a headline query throws (r3 lost every timing to one analysis
exception — a harness that cannot measure under partial failure is
itself a correctness bug), the stdout line must stay compact and prove
the session width (r15: the r13 official comparison was lost when the
per-run dict pushed the line past the driver's capture window, and the
r14 scaling block was read as "CPUS ignored" because nothing proved
the master width), and fences must only fire at their own scale (the
r11 BENCH_sf1.json artifact read as a regression report that was
really a data-size difference).

One subprocess run checks all three contracts (r15: two separate
bench boots cost 124 s of the default tier for no extra coverage —
the injected-failure run at sf0.001 exercises the fence-skip path and
the JSON shape too)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_contract_under_injected_query_failure():
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            # same dir → warm-up phase skipped, keeps the test fast
            "SPARK_GRAFT_WARM_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_CPUS": "8",
            "SPARK_GRAFT_BENCH_REPEATS": "1",
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
    # fences are pinned at sf0.1: an sf0.001 run must carry the
    # explicit skip marker, never a mislabeled regressions key
    assert out["sf"] == 0.001
    assert "regressions" not in out
    assert "fence_sf" not in out
    assert "sf0.1" in out["fences_skipped"]
    # r15 stdout contract: the line must stay compact (the r13 official
    # comparison was lost when the per-run dict pushed it past the
    # driver's capture window) and must prove the session width.
    assert "runs" not in out
    assert out["parallelism"] == 8
    assert len(line) < 4000, f"stdout JSON line too long ({len(line)} chars)"
    # per-run detail still recorded, on stderr
    assert any(l.startswith("# runs {") for l in proc.stderr.splitlines())
