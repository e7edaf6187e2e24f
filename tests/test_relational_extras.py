"""Checks for relational entries whose semantics aren't value-hash
oracle-able (approximate aggregates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ariadne_cartograph_spark.plans.catalog import get_queries
from ariadne_cartograph_spark.sources.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    got = {
        r.l_returnflag: r.approx_parts
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
    for k, est in got.items():
        # rsd=0.02 → 3-sigma ≈ 6%
        assert abs(est - exact[k]) <= 0.06 * exact[k] + 1, (k, est, exact[k])
