"""functions/money.py: exact decimal accumulation invariants.

The sf1 rehearsal showed double-accumulated money sums drift past the
half-cent at ~1e6 rows × ~1e5 magnitude (random-walk of the summation
error ≈ ulp(total)·√n), so round(sum(x), 2) becomes partition-order
lottery. money_sum must instead equal the Python-decimal ground truth
bit-for-bit at ANY partitioning.
"""

from __future__ import annotations

import random
from decimal import Decimal

from pyspark.sql import functions as F

from ariadne_cartograph_spark.functions.money import money, money_sum


def test_money_sum_exact_and_partition_independent(spark):
    rng = random.Random(7)
    cents = [rng.randrange(1, 10_000_000_00) for _ in range(20_000)]
    vals = [c / 100.0 for c in cents]
    expected = float(
        (sum(Decimal(c) for c in cents) / 100).quantize(Decimal("0.01"))
    )
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    results = {
        n: df.repartition(n).agg(money_sum("v").alias("s")).collect()[0].s
        for n in (1, 3, 16)
    }
    assert all(r == expected for r in results.values()), (results, expected)


def test_money_cast_recovers_exact_cents(spark):
    # 2.675's double is 2.67499999999999982…: engines that round the
    # BINARY value emit 2.67 while Spark's double round goes through
    # the shortest decimal repr ("2.675") and emits 2.68 — rounding
    # raw doubles is engine-specific, which is WHY money goes through
    # the decimal cast: every engine casts this double to DECIMAL(,3)
    # as exactly 2.675, and decimal rounding is half-away-from-zero
    # everywhere → 2.68 deterministically.
    df = spark.createDataFrame([(2.675,)], ["v"])
    row = df.select(
        F.round(money(F.col("v"), scale=3), 2).cast("double").alias("dec"),
    ).collect()[0]
    assert row.dec == 2.68
