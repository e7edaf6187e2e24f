"""Sketch-guided exact distributed quantiles (operators/quantile.py).

The operator's contract is EXACT quantile_disc at every scale, so every
test here is an equality check against a plain sorted-list oracle (or
DuckDB for the catalog-shaped case) — no tolerance anywhere.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators.quantile import (
    _thin,
    exact_quantiles,
    partition_quantile_summary,
)

import numpy as np


def _disc_rank(q: float, n: int) -> int:
    return max(1, min(n, math.ceil(q * float(n))))


def _oracle(xs: list, qs: list[float]) -> dict[float, float]:
    s = sorted(xs)
    return {q: s[_disc_rank(q, len(s)) - 1] for q in qs}


def test_thin_preserves_positions():
    # cumulative gap at every kept point == its exact 1-indexed
    # position; the final point (partition max) always survives
    vals = np.arange(1, 12, dtype="float64")  # 11 sorted values
    gaps = np.ones(11, dtype=np.int64)
    v, g = _thin(vals, gaps)
    assert v[-1] == 11.0 and g.sum() == 11
    assert list(np.cumsum(g)) == [2, 4, 6, 8, 10, 11]
    assert list(v) == [2.0, 4.0, 6.0, 8.0, 10.0, 11.0]
    v2, g2 = _thin(v, g)
    assert v2[-1] == 11.0 and g2.sum() == 11
    assert list(np.cumsum(g2)) == [4, 8, 11]
    assert list(v2) == [4.0, 8.0, 11.0]


def test_summary_gap_sum_is_exact_count(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("double").alias("v")
    ).repartition(6)
    summ = partition_quantile_summary(df, "v", ["g"], capacity=8).toPandas()
    # sum(gap) per group == exact group count, despite deep thinning
    got = summ.groupby("g")["__gap"].sum().to_dict()
    exp = {g: (1000 + 6 - g) // 7 for g in range(7)}
    exp = {g: len([i for i in range(1000) if i % 7 == g]) for g in range(7)}
    assert got == exp
    # every (partition, group) summary is capacity-bounded
    assert summ.groupby("g").size().max() <= 6 * 2 * 8


def test_grouped_matches_duckdb(spark, sf_dir):
    qs = [0.0, 0.1, 0.33, 0.5, 0.75, 0.9, 0.99, 1.0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = exact_quantiles(ev, "value", qs, group_cols=["event_type"], capacity=64)
    got = {(r["event_type"], float(r["q"])): r["qv"] for r in res.collect()}
    qlist = ",".join(str(q) for q in qs)
    exp = {
        (r[0], float(r[1])): float(r[2])
        for r in duckdb.sql(
            f"""SELECT event_type, unnest([{qlist}]) AS q,
                       unnest(quantile_disc(value, [{qlist}])) AS qv
                FROM read_parquet('{sf_dir}/events.parquet')
                GROUP BY event_type"""
        ).fetchall()
    }
    assert got == exp


def test_massive_duplicate_skew(spark):
    # one value holding 90% of the mass: the tied summary points must
    # collapse before rank bounds are taken (the lo-below-answer bug),
    # and the band shuffle stays tiny because duplicates combine
    # map-side
    pdf = pd.DataFrame({"v": [5.0] * 9000 + [float(i) for i in range(1000)]})
    df = spark.createDataFrame(pdf).repartition(8)
    qs = [0.05, 0.5, 0.92]
    got = {
        float(r["q"]): r["qv"]
        for r in exact_quantiles(df, "v", qs, capacity=16).collect()
    }
    assert got == _oracle(pdf["v"].tolist(), qs)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_ints_tiny_capacity(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(1, 3000)
    xs = [rng.randint(-50, 50) for _ in range(n)]
    df = spark.createDataFrame(pd.DataFrame({"v": xs})).repartition(5)
    qs = [0.0, 0.01, rng.random(), 0.5, 0.999, 1.0]
    got = {
        float(r["q"]): r["qv"]
        for r in exact_quantiles(df, "v", qs, capacity=8).collect()
    }
    assert got == _oracle(xs, qs)


def test_nulls_ignored_and_single_row(spark):
    pdf = pd.DataFrame({"v": [None, 3.0, None]})
    df = spark.createDataFrame(pdf)
    got = {
        float(r["q"]): r["qv"]
        for r in exact_quantiles(df, "v", [0.0, 0.5, 1.0]).collect()
    }
    assert got == {0.0: 3.0, 0.5: 3.0, 1.0: 3.0}


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").cast("double").alias("v"))
    assert exact_quantiles(df, "v", [0.5]).count() == 0
