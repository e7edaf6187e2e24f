"""Checks for relational entries whose semantics aren't value-hash
oracle-able row-for-row (approximate aggregates): the catalog entry
folds the HLL estimate into an in-bounds boolean; this test re-derives
the exact counts independently and checks both that boolean and the
exact column against them."""

from __future__ import annotations

from pyspark.sql import functions as F

from ariadne_cartograph_spark.plans.catalog import get_queries
from ariadne_cartograph_spark.sources.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    got = {
        r.l_returnflag: r
        for r in get_queries()["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, row in got.items():
        assert row.exact_parts == exact[k], (k, row.exact_parts, exact[k])
        assert row.approx_within_5pct, k


def test_scalable_cumsum_equals_global_window(spark):
    """Two-phase range-partitioned running sum == naive single-partition
    global window, on a frame forced across many partitions."""
    from pyspark.sql.window import Window as W

    from ariadne_cartograph_spark.operators.windows import scalable_cumsum

    df = spark.range(0, 5000, 1, 16).select(
        F.col("id"), (F.col("id") % 97 + 1).alias("v")
    )
    got = {
        r.id: r.cum
        for r in scalable_cumsum(df, ["id"], "v", out_col="cum", num_partitions=16)
        .select("id", "cum")
        .collect()
    }
    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {r.id: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_snapshot_diff_null_safe_classification(spark):
    from pyspark.sql import functions as F

    from ariadne_cartograph_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (5, 50.0)], "k long, v double"
    )
    rows = {r["k"]: r["change"] for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert rows == {
        1: "unchanged",
        2: "update",   # NULL -> value must be an update, not unchanged
        3: "update",   # value -> NULL likewise
        4: "delete",
        5: "insert",
    }
