"""operators/asof.asof_nearest_join — nearest-timestamp join with
tolerance, pinned against a brute-force python model on adversarial
cases: exact-diff ties (must prefer backward), tolerance boundaries
(inclusive), equal-timestamp left/right rows (diff 0), no-match rows,
and partition-count independence."""

from __future__ import annotations

from datetime import datetime, timedelta

from ariadne_cartograph_spark.operators.asof import asof_nearest_join

T0 = datetime(2024, 1, 1, 12, 0, 0)
TOL = 100  # seconds


def _ts(sec: float) -> datetime:
    return T0 + timedelta(seconds=sec)


def _py_nearest(lefts, rights, tol_s):
    """lefts: [(lid, key, sec)], rights: [(key, sec, val)] unique on
    (key, sec). Returns {lid: (val, delta_sec) | None}."""
    out = {}
    for lid, k, ls in lefts:
        best = None
        for rk, rs, v in rights:
            if rk != k:
                continue
            d = abs(rs - ls)
            if d > tol_s:
                continue
            # smaller diff wins; tie -> earlier right row (backward)
            cand = (d, 0 if rs <= ls else 1, rs, v)
            if best is None or cand[:2] < best[:2]:
                best = cand
        out[lid] = None if best is None else (best[3], best[2] - ls)
    return out


def _run(spark, lefts, rights, tol_s=TOL):
    ldf = spark.createDataFrame(
        [(lid, k, _ts(s)) for lid, k, s in lefts],
        "lid long, key long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(s), v) for k, s, v in rights],
        "key long, ts timestamp, val long",
    )
    j = asof_nearest_join(ldf, rdf, on="key", left_ts="ts", right_ts="ts", tolerance_s=tol_s)
    out = {}
    for r in j.collect():
        if r["val_r"] is None:
            out[r["lid"]] = None
        else:
            out[r["lid"]] = (
                r["val_r"],
                (r["ts_r"] - r["ts"]).total_seconds(),
            )
    return out


def test_ties_prefer_backward_and_boundaries_inclusive(spark):
    lefts = [
        (1, 7, 100.0),   # equidistant rights at 90/110 -> backward (90)
        (2, 7, 199.0),   # nearest forward (200) beats backward (110)
        (3, 7, 300.0),   # exactly tol away backward (200) -> inclusive
        (4, 7, 301.0),   # 101s from 200, 99s from 400 -> forward
        (5, 7, 90.0),    # equal-ts right -> diff 0
        (6, 8, 100.0),   # no rights in key 8 within tol
        (7, 8, 5000.0),  # right exists but outside tol
    ]
    rights = [
        (7, 90.0, 11), (7, 110.0, 22), (7, 200.0, 33), (7, 400.0, 44),
        (8, 4800.0, 55),
    ]
    got = _run(spark, lefts, rights)
    want = _py_nearest(lefts, rights, TOL)
    assert got == want
    assert got[1] == (11, -10.0)   # tie broke backward
    assert got[3] == (33, -100.0)  # inclusive boundary
    assert got[5] == (11, 0.0)
    assert got[6] is None and got[7] is None


def test_random_matches_brute_and_partition_independent(spark):
    import random

    rng = random.Random(17)
    rights = []
    seen = set()
    for _ in range(60):
        k, s = rng.randint(1, 5), rng.randint(0, 2000)
        if (k, s) not in seen:
            seen.add((k, s))
            rights.append((k, float(s), rng.randint(1, 999)))
    lefts = [(i, rng.randint(1, 6), float(rng.randint(0, 2100))) for i in range(120)]
    want = _py_nearest(lefts, rights, TOL)
    base = None
    for parts in (1, 9):
        ldf = spark.createDataFrame(
            [(lid, k, _ts(s)) for lid, k, s in lefts],
            "lid long, key long, ts timestamp",
        ).repartition(parts)
        rdf = spark.createDataFrame(
            [(k, _ts(s), v) for k, s, v in rights],
            "key long, ts timestamp, val long",
        )
        j = asof_nearest_join(ldf, rdf, on="key", left_ts="ts", right_ts="ts", tolerance_s=TOL)
        got = {
            r["lid"]: None
            if r["val_r"] is None
            else (r["val_r"], (r["ts_r"] - r["ts"]).total_seconds())
            for r in j.collect()
        }
        base = got if base is None else base
        assert got == base
    assert base == want
    assert any(v is not None for v in base.values())
    assert any(v is None for v in base.values())
