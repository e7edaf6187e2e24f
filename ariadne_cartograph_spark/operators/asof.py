"""As-of (temporal) join operator (SURVEY.md §2.2 J6 "as-of join for events").

Spark has no native ASOF JOIN; the classic emulations are
(a) range join + rank (explodes candidate pairs — O(n·m) per key), or
(b) union + ordered window with last(ignorenulls) — one shuffle, state
bounded by a single row per column, linear in input size.

We implement (b): it is the scale path. Both sides are unioned,
sorted within each key partition by (ts, side), and every left row
picks up the most recent right row's payload via
``last(value, ignorenulls=True)`` over an unbounded-preceding frame.
At 100 TB this is exactly one shuffle on the join key — the same cost
as a regular sort-merge join — with no candidate-pair blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_SIDE = "__asof_side"
_PREFIX = "__asof_r_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` within the same ``on`` key
    (backward as-of, inclusive — DuckDB ``ASOF JOIN`` semantics).

    Rows with no earlier right row get NULLs (left-join semantics).
    ``right_cols`` defaults to all non-key, non-ts right columns; they
    are appended to the left schema as ``<col><suffix>`` plus
    ``<right_ts><suffix>`` for the matched timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = [right_ts, *right_cols]

    l_part = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(_PREFIX + c) for c in payload],
    )
    r_part = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys and c != left_ts],
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(_PREFIX + c) for c in payload],
    ).select(*[c for c in l_part.columns])  # align column order

    # Right rows sort before left rows at equal timestamps (side 0 < 1),
    # making the join inclusive on ties.
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l_part.unionByName(r_part).select(
        "*",
        *[
            F.last(_PREFIX + c, ignorenulls=True).over(w).alias(_PREFIX + c + "__f")
            for c in payload
        ],
    )
    out = filled.filter(F.col(_SIDE) == 1)
    for c in payload:
        out = out.withColumn(c + suffix, F.col(_PREFIX + c + "__f"))
    return out.drop(_SIDE, *[_PREFIX + c for c in payload], *[_PREFIX + c + "__f" for c in payload])


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row whose timestamp is
    NEAREST (|Δt| minimal, within ``tolerance_s`` seconds) in the same
    ``on`` key; exact-diff ties prefer the EARLIER (backward) right
    row. Rows with no right row inside the tolerance get NULLs.

    Scale design: nearest = the better of (backward as-of, forward
    as-of), each a windowed pass over ONE union of both sides — one
    shuffle on the join key, two local sorts (same partitioning,
    opposite tie order), no candidate-pair blowup; the classic range
    join + rank emulation explodes O(n·m) pairs per key inside the
    tolerance window.

    Determinism contract: ``right`` must be unique on (keys,
    right_ts) — at equal timestamps "the" backward/forward row is
    otherwise arbitrary; pre-aggregate the right side per timestamp
    (the entry does) or the caller owns the tie.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = [right_ts, *right_cols]

    l_part = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(_PREFIX + c) for c in payload],
    )
    r_part = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys and c != left_ts],
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(_PREFIX + c) for c in payload],
    ).select(*[c for c in l_part.columns])

    # backward: right rows sort BEFORE left at equal ts (inclusive tie)
    wb = (
        W.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # forward: right rows sort AFTER left at equal ts — side DESC — so
    # an equal-ts right row is inside the following frame (inclusive)
    wf = (
        W.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = l_part.unionByName(r_part).select(
        "*",
        *[
            F.last(_PREFIX + c, ignorenulls=True).over(wb).alias(_PREFIX + c + "__b")
            for c in payload
        ],
        *[
            F.first(_PREFIX + c, ignorenulls=True).over(wf).alias(_PREFIX + c + "__f")
            for c in payload
        ],
    ).filter(F.col(_SIDE) == 1)

    tol_us = int(tolerance_s) * 1_000_000
    lt_us = F.unix_micros(F.col(left_ts))
    diff_b = lt_us - F.unix_micros(F.col(_PREFIX + right_ts + "__b"))
    diff_f = F.unix_micros(F.col(_PREFIX + right_ts + "__f")) - lt_us
    ok_b = F.col(_PREFIX + right_ts + "__b").isNotNull() & (diff_b <= tol_us)
    ok_f = F.col(_PREFIX + right_ts + "__f").isNotNull() & (diff_f <= tol_us)
    take_b = ok_b & (~ok_f | (diff_b <= diff_f))  # tie -> backward
    out = filled
    for c in payload:
        out = out.withColumn(
            c + suffix,
            F.when(take_b, F.col(_PREFIX + c + "__b")).otherwise(
                F.when(ok_f, F.col(_PREFIX + c + "__f"))
            ),
        )
    return out.drop(
        _SIDE,
        *[_PREFIX + c for c in payload],
        *[_PREFIX + c + "__b" for c in payload],
        *[_PREFIX + c + "__f" for c in payload],
    )
