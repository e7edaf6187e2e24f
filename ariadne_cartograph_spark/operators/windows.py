"""Scalable global-order window rewrites.

A window with a global ORDER BY and no PARTITION BY collapses the
whole table into ONE partition — the classic Spark scale-killer (fine
at 10k rows, fatal at 100 TB). The two-phase rewrite here computes the
same result with a range repartition + per-partition local windows +
a broadcast of per-partition offsets: the only driver-side state is
one row per partition (a bounded model statistic, like a quantizer's
centroids), and no executor ever sees more than its own range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def scalable_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` over the GLOBAL ordering given by
    ``order_cols`` (inclusive of the current row), without a
    single-partition window:

    1. ``repartitionByRange(order_cols)`` — rows land in ordered,
       non-overlapping ranges (partition boundaries come from sampling,
       but the OUTPUT is boundary-independent);
    2. per-partition running sum via a window PARTITIONED by
       ``spark_partition_id()`` — parallel, bounded memory;
    3. per-partition totals (one row each) are collected, prefix-summed
       on the driver, and broadcast-joined back as additive offsets.

    The result equals ``sum(value) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` for any ordering where ``order_cols`` is a
    total order (equality asserted vs the naive global window in
    tests/test_relational_extras.py).
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    local_w = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Freeze the computed partition assignment: repartitionByRange
    # SAMPLES boundaries per execution, so without materializing here
    # the offsets job and the final join could see DIFFERENT partition
    # boundaries (off-by-a-few rows at every boundary). The checkpoint
    # also makes the two downstream passes read one materialization.
    local = with_pid.withColumn(
        "__local", F.sum(value_col).over(local_w)
    ).localCheckpoint(eager=True)
    totals = (
        local.groupBy("__pid").agg(F.max("__local").alias("__total")).collect()
    )
    offsets, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["__total"] or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], ["__pid", "__offset"]
    )
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")))
        .drop("__pid", "__local", "__offset")
    )
