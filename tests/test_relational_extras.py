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
