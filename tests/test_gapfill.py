"""events_gapfill_locf — run-length LOCF resample.

The engine never materializes the hourly grid (run-length algebra);
this test pins it against an EXPLICIT grid + carry-forward reference in
Python, covering multi-hour gaps, single-observation users, and
multiple events in one bucket (last by (ts, event_id) wins)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ariadne_cartograph_spark.plans.events_queries import events_gapfill_locf
from ariadne_cartograph_spark.plans.catalog import REGISTRY


def _reference(rows):
    # rows: (event_id, user_id, ts, value)
    by_user = {}
    for eid, uid, ts, v in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        slot = by_user.setdefault(uid, {})
        # last event in the hour by (ts, event_id)
        if h not in slot or (ts, eid) > slot[h][0]:
            slot[h] = ((ts, eid), v)
    out = {}
    for uid, slots in by_user.items():
        hours = sorted(slots)
        h0, h1 = hours[0], hours[-1]
        n_slots = int((h1 - h0).total_seconds() // 3600) + 1
        locf_total, cur, n_gaps = 0.0, None, 0
        h = h0
        while h <= h1:
            if h in slots:
                cur = slots[h][1]
            else:
                n_gaps += 1
            locf_total += cur
            h += dt.timedelta(hours=1)
        out[uid] = (n_slots, n_gaps, round(locf_total, 2))
    return out


def test_matches_explicit_grid_reference(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1, 10, 15)
    rows = [
        # user 1: obs at 10h, gap 11-13h, obs 14h; two events in 10h
        (1, 1, t0, 5.25),
        (2, 1, t0 + dt.timedelta(minutes=30), 7.75),  # later → wins slot
        (3, 1, t0 + dt.timedelta(hours=4), 1.00),
        # user 2: single observation
        (4, 2, t0, 3.50),
        # user 3: adjacent hours, no gaps
        (5, 3, t0, 2.00),
        (6, 3, t0 + dt.timedelta(hours=1), 4.00),
    ]
    df = spark.createDataFrame(
        [(e, u, ts, v, "t", "{}") for e, u, ts, v in rows],
        "event_id long, user_id long, ts timestamp, value double, event_type string, props string",
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.parquet(sf + "/events.parquet")
    got = {
        r["user_id"]: (r["n_slots"], r["n_gaps"], round(r["locf_total"], 2))
        for r in events_gapfill_locf(spark, sf).collect()
    }
    assert got == _reference(rows)
    # user 1: slots 10..14 = 5; gaps 11,12,13 = 3; locf = 7.75*4 + 1.0
    assert got[1] == (5, 3, 32.0)
    assert got[2] == (1, 0, 3.5)
