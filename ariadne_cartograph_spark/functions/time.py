"""Timestamp arithmetic helpers tolerant of TIMESTAMP and TIMESTAMP_NTZ.

The driver's parquet writer has flipped between TIMESTAMP(NANOS)-as-long,
TIMESTAMP (UTC-adjusted), and TIMESTAMP_NTZ across rounds. The scan
surface (`sources.tables.load_table`) normalizes to TIMESTAMP, but any
code path that receives a DataFrame it did not load (external sessions,
raw `spark.read`) must still analyze cleanly. `micros()` is the single
sanctioned way to get epoch-microsecond BIGINTs: exact integer
arithmetic (no double rounding, which poisons oracle parity) and a
`cast("timestamp")` that is a no-op on TIMESTAMP and a session-tz
(UTC-pinned) reinterpretation on TIMESTAMP_NTZ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micros(col: Column | str) -> Column:
    """Epoch microseconds as BIGINT for TIMESTAMP or TIMESTAMP_NTZ input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
