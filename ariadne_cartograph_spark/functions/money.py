"""Exact money aggregation — scale-stable oracle parity.

A double-accumulated sum of 2-decimal money drifts in the last ulp
with partition count and addition order; when the mathematically
exact total lands on a half-cent midpoint (common: sums of cent-
granular values ARE such midpoints), ``round(sum(x), 2)`` flips to
different sides in different engines. Invisible at sf0.01; observed
at the sf1 rehearsal on ``sum(o_totalprice)`` over 1.5M rows
(375233912585.595 → Spark .59, DuckDB .60).

Fix: recover each value's exact decimal (the cast rounds the double
to the nearest `scale`-decimal value — deterministic in every engine
because doubles storing k-decimal values sit ~1 ulp from the exact
decimal, never near the cast's own midpoint), accumulate in exact
decimal arithmetic (order- and partition-independent), round the
exact total (both engines round decimals half-away-from-zero —
verified), and emit DOUBLE (the parity harness rejects decimal128
output on purpose).

DuckDB oracle twin of ``money_sum(c, s)``:
``CAST(round(sum(CAST(c AS DECIMAL(27,s))), 2) AS DOUBLE)``.

Scale cheat-sheet for TPC-H-ish columns: raw money (o_totalprice,
l_extendedprice, value, c_acctbal) → 2; price*(1±discount) → 4;
price*(1-discount)*(1+tax) → 6. Using a too-large scale is safe
(the cast is then exact); too small silently re-rounds terms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: Column | str, scale: int = 2) -> Column:
    """Cast a money-valued double to its exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(27,{scale})")


def money_sum(col: Column | str, scale: int = 2, round_to: int = 2) -> Column:
    """Exact decimal sum of a money column, rounded, as DOUBLE."""
    return F.round(F.sum(money(col, scale)), round_to).cast("double")
