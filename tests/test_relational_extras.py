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
