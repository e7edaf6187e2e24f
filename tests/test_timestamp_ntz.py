"""Timestamp-type hardening: the engine must analyze and agree whether the
driver's parquet reads as TIMESTAMP or TIMESTAMP_NTZ.

The writer's schema has drifted between rounds (TIMESTAMP(NANOS)-as-long →
UTC-adjusted µs → µs with isAdjustedToUTC=false, which Spark 4 infers as
TIMESTAMP_NTZ). These tests force NTZ inference ON and OFF and pin that:

1. `load_table` always yields a native TIMESTAMP `ts` column;
2. `functions.time.micros` analyzes on both raw readings and yields the
   same epoch micros (session tz is pinned UTC);
3. the sessionize operator — the r3 casualty — produces identical output
   either way.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.functions.time import micros
from ariadne_cartograph_spark.operators.sessionize import session_bounds
from ariadne_cartograph_spark.sources.tables import load_table

from .conftest import SF_SMOKE

_NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"


def _raw_events(spark, ntz: bool):
    old = spark.conf.get(_NTZ_CONF)
    spark.conf.set(_NTZ_CONF, str(ntz).lower())
    try:
        # Read eagerly-analyzed schema while the conf is set.
        df = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
        df.schema  # force analysis under this conf
        return df
    finally:
        spark.conf.set(_NTZ_CONF, old)


def test_load_table_normalizes_to_timestamp(spark):
    df = load_table(spark, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("ntz", [True, False])
def test_micros_analyzes_under_both_readings(spark, ntz):
    df = _raw_events(spark, ntz)
    got = df.select(micros("ts").alias("us")).agg(F.sum("us")).first()[0]
    ref = (
        load_table(spark, SF_SMOKE, "events")
        .select(micros("ts").alias("us"))
        .agg(F.sum("us"))
        .first()[0]
    )
    assert got == ref


@pytest.mark.parametrize("ntz", [True, False])
def test_sessionize_under_both_readings(spark, ntz):
    df = _raw_events(spark, ntz)
    out = session_bounds(df, key="user_id", ts="ts", gap_seconds=3600,
                         order_tiebreak="event_id")
    rows = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("tot")
    ).first()
    ref = session_bounds(
        load_table(spark, SF_SMOKE, "events"),
        key="user_id", ts="ts", gap_seconds=3600, order_tiebreak="event_id",
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("tot")).first()
    assert (rows["n"], rows["tot"]) == (ref["n"], ref["tot"])
