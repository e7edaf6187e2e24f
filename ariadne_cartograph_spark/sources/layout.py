"""Spatial table layout for the 100 TB posture (SURVEY.md §4.1
partition pruning + §7 Phase 5): partition geo tables by XYZ tile cell
so region-scoped queries prune at the directory level before any I/O.

The reference has no partitioning (its PostGIS tables rely on GiST
indexes, README.md:27-31 — S9, a documented non-goal for Spark); the
Spark-native substitute is Hive-style partition layout on a coarse
tile key plus Catalyst's static partition pruning, which turns a
bbox/tile predicate into "read only these directories". Choose the
partition zoom so one cell holds hundreds of MB (z5-z8 for continental
data); finer grouping happens inside files via sort-on-write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import lnglat_to_tile_pixel


def with_tile_partition(
    df: DataFrame, lng_col: str, lat_col: str, zoom: int = 6
) -> DataFrame:
    """Append (pt_z, pt_x, pt_y) partition-key columns from a point."""
    tx, ty, _, _ = lnglat_to_tile_pixel(lng_col, lat_col, zoom)
    return (
        df.withColumn("pt_z", F.lit(zoom))
        .withColumn("pt_x", tx)
        .withColumn("pt_y", ty)
    )


def write_partitioned_by_tile(
    df: DataFrame,
    path: str,
    lng_col: str,
    lat_col: str,
    zoom: int = 6,
    mode: str = "overwrite",
) -> None:
    """Write parquet Hive-partitioned by tile cell. repartition on the
    partition key first so each cell is written by one task (no
    small-file explosion: tasks × cells files otherwise)."""
    keyed = with_tile_partition(df, lng_col, lat_col, zoom)
    (
        keyed.repartition("pt_x", "pt_y")
        .write.mode(mode)
        .partitionBy("pt_z", "pt_x", "pt_y")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Write a catalog table bucketed (and optionally sorted) by
    ``key`` — the co-located-join layout: two tables bucketed the same
    way join with NO shuffle on either side (verified by plan in
    tests/test_layout_config.py). At 100 TB this is the difference
    between a fact-fact join moving both tables and moving neither;
    pick n_buckets ≈ cluster cores × a small factor, and keep it
    IDENTICAL across tables that join together."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_tile_cells(
    spark: SparkSession, path: str, cells: list[tuple[int, int, int]]
) -> DataFrame:
    """Read only the given (z, x, y) cells — the predicate lands in
    PartitionFilters (directory pruning), verified in
    tests/test_layout.py."""
    df = spark.read.parquet(path)
    cond = None
    for z, x, y in cells:
        c = (F.col("pt_z") == z) & (F.col("pt_x") == x) & (F.col("pt_y") == y)
        cond = c if cond is None else (cond | c)
    return df.filter(cond) if cond is not None else df
