"""Gap-based sessionization (SURVEY.md §2.6 T2 batch analog).

Assigns a session id to each event: a new session starts when the gap
to the previous event of the same key reaches ``gap`` (inclusive — an
event exactly ``gap`` after its predecessor opens a NEW session, the
same boundary Structured Streaming's ``session_window`` uses: events
merge only while ts < prev_ts + gap). Built from lag + conditional +
running sum windows — one shuffle on the key, identical to the plan
``session_window`` uses for batch, but usable with arbitrary
downstream batch ops and expressible in ANSI SQL for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.time import micros


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Add ``session_seq`` (1-based per key) to ``df``.

    The window orders by (ts, tiebreak) so results are deterministic
    under duplicate timestamps.
    """
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    # Exact BIGINT micros arithmetic — seconds-as-double casts round
    # differently across engines and poison oracle parity.
    gap = micros(ts) - F.lag(micros(ts)).over(w)
    is_new = F.when(gap.isNull() | (gap >= F.lit(gap_seconds).cast("long") * 1000000), 1).otherwise(0)
    run = W.partitionBy(key).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(run).cast("long")
    ).drop("__new")


def session_bounds(
    df: DataFrame, key: str, ts: str, gap_seconds: int, order_tiebreak: str | None = None
) -> DataFrame:
    """One row per (key, session): start/end/duration/event count."""
    s = sessionize(df, key, ts, gap_seconds, order_tiebreak)
    return s.groupBy(key, "session_seq").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        ((F.max(micros(ts)) - F.min(micros(ts))) / F.lit(1000000.0))
        .alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
    )
