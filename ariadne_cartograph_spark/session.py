"""SparkSession factory with scale-oriented defaults.

Defaults here are tuned for correctness parity with an ANSI-SQL oracle
and for the 100 TB design posture described in SURVEY.md §4:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) so the same declarative plan adapts from sf0.001 local
  runs to a 1000-executor cluster.
- Arrow on for the pandas-UDF paths (tile decode, multimodal).
- Session timezone pinned to UTC so timestamp semantics match a
  timezone-naive oracle (DuckDB / PostGIS both store naive timestamps).
- `nanosAsLong` so INT64 TIMESTAMP(NANOS) parquet (as written by modern
  Arrow) is readable; sources.tables converts to native timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that every entry point (re-)applies, so the
# engine behaves identically whether it builds the session itself or is
# handed one by an external driver.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # timestamp[us] parquet with isAdjustedToUTC=false would otherwise
    # infer as TIMESTAMP_NTZ, which unix_micros()/watermarks reject.
    # Session tz is UTC, so reading it as TIMESTAMP preserves values.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


_WARNED_CONFS: set[str] = set()


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:
            # A conf that can't be applied (e.g. non-runtime-settable in a
            # foreign session) can silently skew oracle parity — warn once
            # per conf so the drift is visible, then continue.
            if k not in _WARNED_CONFS:
                _WARNED_CONFS.add(k)
                import warnings

                warnings.warn(f"could not apply runtime conf {k}={v}: {exc}")
    return spark


def release_session_state(spark: SparkSession) -> None:
    """Drop this session's temporary views — between sweep entries.

    Streaming parity entries drain availableNow memory sinks into
    uuid-named temp views that stay registered (rows pinned in driver
    memory) after the entry collects them; across a 162-entry sweep or
    a min-of-N bench loop that is real heap pressure. Harness-only:
    every caller (scale_rehearsal, run_catalog_parity, ab_entry, bench)
    owns its session and recreates any view it needs per entry."""
    try:
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
    except Exception:
        pass


def get_spark(
    app_name: str = "ariadne-cartograph-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[N] here; on a real cluster the same confs apply — only
    master/deploy settings change.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ContextCleaner's periodic driver GC defaults to 30min — longer
        # than a whole 162-entry sweep, so shuffle files, broadcast
        # blocks, and localCheckpoint RDDs whose references are long
        # gone pile up and the late-alphabet entries measure eviction/GC
        # pressure instead of their plans (the r11 "in-context 2.2x"
        # phantom-flag class). 5min bounds the accumulation.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)
