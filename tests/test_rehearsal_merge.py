"""Unit tests for tools/scale_rehearsal.merge_summary — the artifact
merge that must never lose note_r* history (r11 verdict item: full
regenerations dropped the top-level notes, --only runs overwrote the
whole JSON)."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "scale_rehearsal",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "scale_rehearsal.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
merge_summary = _mod.merge_summary


PREV = {
    "sf_dir": "/old",
    "note_r9": "narrative",
    "n_entries": 2,
    "n_fail": 0,
    "n_hash_checked": 1,
    "n_spark_only": 1,
    "total_sec": 30.0,
    "total_engine_sec": 20.0,
    "total_oracle_sec": 5.0,
    "engine_regressions": {"a": {"engine_sec": 99, "fence_sec": 1}},
    "entries": {
        "a": {"status": "ok", "rows": 5, "sec": 10.0, "engine_sec": 8.0,
              "oracle_sec": 2.0, "note_r10": "per-entry history"},
        "b": {"status": "spark_only", "rows": 7, "sec": 20.0,
              "engine_sec": 12.0, "oracle_sec": 3.0},
    },
}


def test_partial_run_keeps_untouched_entries_and_notes():
    fresh = {"a": {"status": "ok", "rows": 5, "sec": 4.0, "engine_sec": 3.0,
                   "oracle_sec": 1.0}}
    out = merge_summary(PREV, fresh, "/new", 0, {})
    assert out["note_r9"] == "narrative"            # top-level note survives
    assert out["entries"]["b"]["sec"] == 20.0        # untouched entry kept
    a = out["entries"]["a"]
    assert a["sec"] == 4.0                           # fresh measurement wins
    assert a["note_r10"] == "per-entry history"      # per-entry note survives
    assert out["n_entries"] == 2
    assert out["total_sec"] == 24.0                  # recomputed over merge
    assert out["total_engine_sec"] == 15.0
    assert out["engine_regressions"] == {}           # this run's, not stale
    assert out["sf_dir"] == "/new"


def test_full_regen_preserves_unknown_top_level_keys():
    fresh = {
        "a": {"status": "ok", "rows": 5, "sec": 1.0, "engine_sec": 0.5,
              "oracle_sec": 0.2},
        "b": {"status": "FAIL", "rows": -1, "sec": 2.0, "engine_sec": 1.0,
              "oracle_sec": 0.5},
    }
    out = merge_summary(PREV, fresh, "/new", 1, {"b": {}})
    assert out["note_r9"] == "narrative"
    assert out["n_fail"] == 1
    assert out["n_hash_checked"] == 2  # ok + FAIL both hash-checked shapes
    assert out["n_spark_only"] == 0
    assert out["entries"]["a"]["note_r10"] == "per-entry history"


def test_empty_prev_is_a_plain_write():
    fresh = {"x": {"status": "ok", "rows": 1, "sec": 1.0, "engine_sec": 1.0,
                   "oracle_sec": None}}
    out = merge_summary({}, fresh, "/d", 0, {})
    assert out["n_entries"] == 1
    assert out["total_oracle_sec"] == 0.0
