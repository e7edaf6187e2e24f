"""Parquet scan surface over the driver testdata (SURVEY.md §2.1 S10).

The reference's only scan is a 2-column projection over a PostGIS table
(`/root/reference/update_ways_metadata.py:22`); here the analogous
surface is `spark.read.parquet` with Catalyst handling column pruning
and predicate pushdown automatically.

Scale notes (100 TB posture):
- No `.cache()` / `.collect()` here — loaders return lazy DataFrames so
  filters/projections written by callers push down into the scan.
- Timestamp columns arrive as INT64 TIMESTAMP(NANOS) (Arrow default),
  which the Spark vectorized reader rejects; we read them as raw longs
  (`spark.sql.legacy.parquet.nanosAsLong`) and convert with *integer*
  division (`div 1000`) — double division would lose precision at
  nanosecond epoch magnitudes (~1.7e18 > 2^53).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as TIMESTAMP(NANOS) in the driver parquet; read as long
# nanos and converted to native TimestampType (microsecond, truncating —
# matching how a microsecond-precision oracle reads the same files).
_NANO_TS_COLS = {
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
    "events": ["ts"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a lazy DataFrame with native types."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Parquet written as timestamp[us] without UTC adjustment infers as
    # TIMESTAMP_NTZ under Spark 4; normalize to session-tz TIMESTAMP (the
    # session is pinned UTC, so values are preserved and `unix_micros` /
    # window arithmetic downstream stay valid). Applies to every ts
    # column, not a fixed list — the writer's schema has drifted between
    # rounds and the scan surface is the one place to absorb that.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    for c in _NANO_TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# fan_out's default target. A CONSTANT, not defaultParallelism, on
# purpose: partial-sum grouping for double avg/sum aggregates downstream
# varies with the partition count, and a host-dependent default could
# flip a last-ulp float value hash between machines with different core
# counts (the f32 output policy absorbs one grouping, not every
# grouping). 32 matches the driver's local[32]; callers on big clusters
# pass min_partitions explicitly.
# Floor for fan_out when the cluster width can't be read. The live
# default is the session's defaultParallelism (= cores in local mode,
# total executor cores on a cluster), so the CPU-bound projection
# behind the repartition can occupy the whole machine at ANY width —
# a constant here was tuned to local[32] and capped a 1000-core
# cluster's parse/hash stages at 32 tasks (r14 optimization round).
_FAN_OUT_FLOOR = 8


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: the session's
    ``defaultParallelism``, i.e. the actual core count) partitions
    ahead of a CPU-bound projection (hashing, regex, shingling).
    Columnar text compresses hard, so a scan can produce far fewer
    splits than cores while the projection is compute-dominated — e.g.
    the sf1 documents table is one 860 KB split whose fingerprint
    projection is 12 s of single-threaded hashing. The repartition
    ships only the (tiny) compressed-at-rest rows; it's a no-op when
    the scan already splits enough, so at real multi-TB scale
    (thousands of natural splits) nothing is added. Partition count
    never affects results (pinned by the replica partition-invariance
    tests), so deriving it from the session is safe."""
    if min_partitions is None:
        try:
            min_partitions = df.sparkSession.sparkContext.defaultParallelism
        except Exception:
            min_partitions = _FAN_OUT_FLOOR
    target = max(min_partitions, _FAN_OUT_FLOOR)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register all tables as temp views (for the SQL entry points)."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t + suffix)
