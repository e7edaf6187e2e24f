"""Sketch-guided EXACT distributed quantiles (A5 + north-star sketch
family): mergeable per-partition quantile summaries bracket each target
rank, then a band-limited second pass selects the exact order statistic.

This is the quantile analog of the Misra-Gries heavy-hitters plan in
``operators/sketch.py`` (candidates from a mergeable summary, then an
exact bounded recount), completing the mergeable-sketch family
(Agarwal et al., "Mergeable Summaries", PODS'12) with the member the
reference's enrichment dataflow motivates: the flagship pipeline's
exact-median step (`/root/reference/update_ways_metadata.py:92-104`
groups tile pixels and takes a true median, not an approximation) —
here generalized to arbitrary quantile sets at cluster scale.

Semantics: DuckDB/Postgres ``quantile_disc`` — the value at 1-indexed
rank ``max(1, ceil(q * n))`` of the sorted non-null values (verified
against DuckDB on multiple (q, n) probes). Because the result is an
element of the input, not an interpolation, the output is bit-exact and
hash-checkable against a SQL oracle at EVERY scale — there is no
"approximate at large n" degradation anywhere in this operator.

The two-pass plan:

  pass 1  ``sortWithinPartitions(groups, value)`` (Spark-side sort:
          spills, never materializes a partition in Python), then a
          mapInPandas scan that maintains, per group, a THINNED list of
          order statistics: (value, gap) points where gap_j = the
          number of partition rows between point j-1 and point j. The
          list starts at gap=1 per row and halves (doubling the stride)
          whenever it exceeds 2*capacity, so memory is O(capacity) per
          group and the emitted gap never exceeds ~2*n_p/capacity. Only
          these summary rows leave the executor — the ONLY data that
          shuffles in pass 1 is sketch rows, never raw values.

  driver  merge summaries per group (exact rank lower bounds at every
          point: LB(v) = sum of gaps with value <= v; conservative
          upper bound UB(v) <= LB(v) + S with S = sum over partitions
          of that partition's max gap). For target rank r pick
          lo = largest point value with LB+S < r (rank(lo) < r, so the
          r-th element is strictly above lo) and hi = smallest point
          value with LB >= r (the r-th element is <= hi). The merged
          summary is capacity x n_partitions rows — model-sized here;
          at extreme partition counts the same thinning step composes
          as a tree reduce (summaries are themselves (value, gap)
          multisets), which is the documented 100 TB posture.

  pass 2  ONE broadcast join of the data against the tiny per-(group,
          quantile) bounds table, pruned to ``value <= hi`` at the
          scan, then a single map-side-combinable aggregate:
          groupBy(group, quantile, band_value) where band_value is
          NULL for rows at-or-below lo (their exact count becomes the
          rank base) and the raw value inside the band (lo, hi]. A
          range-frame cumulative sum ordered by band_value (nulls
          first, so the base count leads) finds the first band value
          whose cumulative rank reaches r — the exact quantile. The
          shuffle carries one row per DISTINCT band value (band size
          <= ~2 * sum_p(max gap) ~ 2n/capacity rows, FEWER distinct) —
          and because duplicates collapse in the map-side combine, a
          billion-row tie on one value costs one shuffle row, not a
          sort of a billion rows: the plan is skew-proof by
          construction.

Scale audit (100 TB): pass 1 shuffles <= capacity rows per partition;
the driver state is summary-sized; pass 2's shuffle is O(distinct band
values) with map-side combine, and the pre-aggregate scan is pruned to
``value <= max(hi)`` per group. No full-data sort, no all-rows shuffle,
no driver collect of data-sized state anywhere.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _thin(vals: np.ndarray, gaps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Halve a (value, gap) summary, keeping the LATER point of each
    pair so every kept point's cumulative gap still equals its exact
    1-indexed position among the partition's sorted values. An odd
    trailing point is always kept, so the final order statistic
    (position n_p, the partition max) survives every thinning."""
    n = len(vals)
    pairs = n // 2
    kept_v = vals[1 : 2 * pairs : 2]
    kept_g = gaps[0 : 2 * pairs : 2] + gaps[1 : 2 * pairs : 2]
    if n % 2:
        kept_v = np.append(kept_v, vals[-1])
        kept_g = np.append(kept_g, gaps[-1])
    return kept_v, kept_g


def partition_quantile_summary(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    capacity: int = 4096,
) -> DataFrame:
    """Per-partition mergeable quantile summary: rows (group...,
    value, gap) where, within each (partition, group), points are
    ascending in value and the cumulative gap at each point equals
    that point's exact position in the group's sorted values.
    ``sum(gap)`` over a group is exactly that group's non-null row
    count. At most ~2*capacity points per (partition, group)."""
    groups = list(group_cols or [])
    src = df.select(*groups, value_col).filter(F.col(value_col).isNotNull())
    src = src.sortWithinPartitions(*groups, value_col)
    val_type = src.schema[value_col].dataType
    out_schema = StructType(
        [src.schema[g] for g in groups]
        + [StructField("__val", val_type), StructField("__gap", LongType())]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # group tuple -> [vals ndarray, gaps ndarray]; rows arrive
        # sorted by (groups, value), so appends stay ascending.
        state: dict[tuple, list[np.ndarray]] = {}
        for batch in batches:
            if batch.empty:
                continue
            if groups:
                segs = batch.groupby(groups, sort=False, dropna=False)
            else:
                segs = [((), batch)]
            for key, seg in segs:
                if not isinstance(key, tuple):
                    key = (key,)
                v = seg[value_col].to_numpy()
                g = np.ones(len(v), dtype=np.int64)
                if key in state:
                    pv, pg = state[key]
                    v = np.concatenate([pv, v])
                    g = np.concatenate([pg, g])
                while len(v) > 2 * capacity:
                    v, g = _thin(v, g)
                state[key] = [v, g]
        for key, (v, g) in state.items():
            out = pd.DataFrame({"__val": v, "__gap": g})
            for i, gcol in enumerate(groups):
                out.insert(i, gcol, key[i])
            yield out

    return src.mapInPandas(summarize, schema=out_schema)


def _rank_for(q: float, n: int) -> int:
    """DuckDB quantile_disc rank: 1-indexed max(1, ceil(q*n)), with
    the same IEEE-double product DuckDB computes."""
    return max(1, min(n, math.ceil(q * float(n))))


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    group_cols: list[str] | None = None,
    capacity: int = 4096,
    out_col: str = "qv",
) -> DataFrame:
    """EXACT ``quantile_disc`` values for each group and each q in
    ``quantiles``. Output columns: group_cols..., ``q`` (double),
    ``out_col`` (the input value type). NULL values are ignored;
    groups with no non-null values produce no rows (matching SQL
    aggregate semantics under GROUP BY)."""
    groups = list(group_cols or [])
    spark = df.sparkSession
    qs = sorted(set(float(q) for q in quantiles))
    if not qs:
        raise ValueError("quantiles must be non-empty")
    if any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")

    summary = partition_quantile_summary(df, value_col, groups, capacity)
    # Summary rows are model-sized (<= ~2*capacity per partition-group;
    # tree-compose the same thinning for extreme partition counts).
    spid = F.spark_partition_id()
    pdf = summary.withColumn("__pid", spid).toPandas()

    val_type = df.schema[value_col].dataType
    bounds_schema = StructType(
        [df.schema[g] for g in groups]
        + [
            StructField("__q", DoubleType(), False),
            StructField("__r", LongType(), False),
            StructField("__lo", val_type, True),
            StructField("__has_lo", LongType(), False),
            StructField("__hi", val_type, False),
        ]
    )
    out_fields = groups + ["q", out_col]
    if pdf.empty:
        empty = StructType(
            [df.schema[g] for g in groups]
            + [StructField("q", DoubleType(), False), StructField(out_col, val_type)]
        )
        return spark.createDataFrame([], empty)

    bounds_rows: list[tuple] = []
    if groups:
        grouped = pdf.groupby(groups, sort=False, dropna=False)
    else:
        grouped = [((), pdf)]
    for key, gpdf in grouped:
        if not isinstance(key, tuple):
            key = (key,)
        # Collapse tied point values FIRST: LB at a value must count
        # every summary point at-or-below it, including same-value
        # points from other partitions (a massive duplicate emits many
        # points with one value; treating each tie's own cumsum as
        # that value's rank bound understates count(<= lo) and can put
        # the answer below the band).
        agg = gpdf.groupby("__val", sort=True)["__gap"].sum()
        vals = agg.index.to_numpy()
        cum = np.cumsum(agg.to_numpy())  # exact LB per distinct value
        n = int(cum[-1])
        # conservative slack: sum over partitions of that partition's
        # max gap (>= any "next gap - 1" the true UB would add)
        slack = int(gpdf.groupby("__pid")["__gap"].max().sum())
        def _py(x):
            return x.item() if hasattr(x, "item") else x

        for q in qs:
            r = _rank_for(q, n)
            # hi: smallest point value with LB >= r  (always exists)
            hi = _py(vals[int(np.searchsorted(cum, r, side="left"))])
            # lo: largest point value with LB + slack < r
            lo_idx = int(np.searchsorted(cum, r - slack, side="left")) - 1
            if lo_idx >= 0:
                bounds_rows.append((*key, q, r, _py(vals[lo_idx]), 1, hi))
            else:
                bounds_rows.append((*key, q, r, None, 0, hi))

    bounds = spark.createDataFrame(bounds_rows, bounds_schema)

    src = df.select(*groups, value_col).filter(F.col(value_col).isNotNull())
    joined = (
        src.join(F.broadcast(bounds), on=groups) if groups
        else src.crossJoin(F.broadcast(bounds))
    )
    v = F.col(value_col)
    below = (F.col("__has_lo") == 1) & (v <= F.col("__lo"))
    banded = (
        joined.filter(v <= F.col("__hi"))
        # band_value NULL => "at or below lo": its exact count is the
        # rank base; otherwise the raw value inside (lo, hi].
        .withColumn("__band_v", F.when(~below, v))
        .groupBy(*groups, "__q", "__r", "__band_v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w = (
        Window.partitionBy(*groups, "__q")
        .orderBy(F.col("__band_v").asc_nulls_first())
    )
    return (
        banded.withColumn("__cum", F.sum("__cnt").over(w))
        .filter(F.col("__band_v").isNotNull() & (F.col("__cum") >= F.col("__r")))
        .groupBy(*groups, "__q")
        .agg(F.min("__band_v").alias(out_col))
        .select(*groups, F.col("__q").alias("q"), out_col)
    )
