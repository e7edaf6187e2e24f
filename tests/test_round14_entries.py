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


# ---------------------------------------------------------------------------
# r14 continuation entries: Simpson diversity fold, source-overlap HOF
# pair enumeration, Gini via scalable rank, clustering coefficient on
# known graphs, and the exact-integer reciprocal-rank scale.
# ---------------------------------------------------------------------------


def test_simpson_fold_vs_counter(spark):
    """The sorted-array run-length fold Σ nᵢ(nᵢ−1) must match a Python
    Counter on texts covering: all-distinct, all-same, mixed runs,
    single token, and empty string."""
    from collections import Counter

    texts = [
        "a b c d",            # all distinct -> 0
        "x x x x",            # one run of 4 -> 12
        "a a b b b c",        # 2 + 6 + 0 = 8
        "solo",               # N=1 -> 0
        "",                   # N=0 -> 0 pairs, NULL simpson
        "t t",                # 2 tokens same -> 2, simpson 0
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    words = F.array_sort(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    )
    same_pairs = F.aggregate(
        words,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("acc"),
        ),
        lambda st, tok: F.struct(
            tok.alias("prev"),
            F.when(tok == st["prev"], st["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(tok == st["prev"], st["acc"])
            .otherwise(st["acc"] + st["run"] * (st["run"] - 1))
            .alias("acc"),
        ),
        lambda st: st["acc"] + st["run"] * (st["run"] - 1),
    )
    got = {
        r["doc_id"]: r["sp"]
        for r in df.select("doc_id", same_pairs.alias("sp")).collect()
    }
    for i, t in rows:
        counts = Counter(w for w in t.split() if w)
        want = sum(c * (c - 1) for c in counts.values())
        assert got[i] == want, (i, t, got[i], want)


def test_source_overlap_pairs_vs_itertools(spark):
    """The row-local slice/transform pair enumeration must equal
    itertools.combinations over each token's sorted source set."""
    from itertools import combinations

    rows = [
        ("s1", "alpha"), ("s2", "alpha"), ("s3", "alpha"),
        ("s1", "beta"), ("s3", "beta"),
        ("s2", "gamma"),
    ]
    vocab = spark.createDataFrame(rows, "source string, tok string")
    srcs = (
        vocab.groupBy("tok")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    pairs = srcs.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(srcs, (x, i) -> "
                    "transform(slice(srcs, i + 2, size(srcs)), "
                    "y -> struct(x AS a, y AS b)))"
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    got = sorted((r["a"], r["b"]) for r in pairs.collect())

    by_tok: dict[str, list[str]] = {}
    for s, t in rows:
        by_tok.setdefault(t, []).append(s)
    want = sorted(
        pair
        for t, ss in by_tok.items()
        if len(set(ss)) >= 2
        for pair in combinations(sorted(set(ss)), 2)
    )
    assert got == want


def test_gini_scalable_rank_matches_naive_window(spark):
    """events_user_gini's global rank comes from scalable_cumsum over
    ones; it must equal a plain row_number over the same total order,
    and the quantized Gini must match brute-force Python."""
    from pyspark.sql.window import Window as W

    from ariadne_cartograph_spark.operators.windows import scalable_cumsum

    counts = [5, 1, 1, 9, 3, 3, 3, 20, 1, 7]
    pc = spark.createDataFrame(
        [(uid, c) for uid, c in enumerate(counts)], "user_id long, cnt long"
    ).withColumn("__one", F.lit(1).cast("long"))
    ranked = scalable_cumsum(pc, ["cnt", "user_id"], "__one", out_col="i")
    naive = pc.withColumn(
        "i_naive",
        F.row_number().over(W.orderBy(F.asc("cnt"), F.asc("user_id"))),
    )
    j = ranked.join(naive.select("user_id", "i_naive"), "user_id")
    assert j.filter(F.col("i") != F.col("i_naive")).count() == 0

    got = ranked.agg(
        F.expr(
            "((2 * sum(i * cnt) - (count(*) + 1) * sum(cnt)) * 1000000)"
            " DIV (count(*) * sum(cnt))"
        ).alias("g")
    ).first()["g"]
    cs = sorted(counts)
    n, tot = len(cs), sum(cs)
    s1 = sum((idx + 1) * c for idx, c in enumerate(cs))
    want = ((2 * s1 - (n + 1) * tot) * 1_000_000) // (n * tot)
    assert got == want


def test_clustering_coefficient_on_known_graphs(spark):
    """K4: every node has deg 3 and sits in 3 triangles → cc = 1
    exactly (1_000_000 micro). Path 1-2-3: no triangles → cc 0 for
    the middle node, NULL for the degree-1 endpoints."""
    from ariadne_cartograph_spark.operators.graph import triangle_participation

    def cc_frame(edge_list):
        edges = spark.createDataFrame(edge_list, "a long, b long")
        dir2 = edges.select(F.col("a").alias("node_id")).unionByName(
            edges.select(F.col("b").alias("node_id"))
        )
        deg = dir2.groupBy("node_id").agg(F.count(F.lit(1)).alias("degree"))
        tri = triangle_participation(edges)
        return {
            r["node_id"]: (r["degree"], r["cc"])
            for r in deg.join(tri, "node_id", "left")
            .select(
                "node_id",
                "degree",
                F.when(
                    F.col("degree") >= 2,
                    F.expr(
                        "(2 * coalesce(n_triangles, 0) * 1000000)"
                        " DIV (degree * (degree - 1))"
                    ),
                ).alias("cc"),
            )
            .collect()
        }

    k4 = cc_frame([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    assert k4 == {i: (3, 1_000_000) for i in (1, 2, 3, 4)}

    path = cc_frame([(1, 2), (2, 3)])
    assert path[2] == (2, 0)
    assert path[1] == (1, None) and path[3] == (1, None)


def test_rr_scale_exact_for_all_cutoffs():
    """720720 DIV rank is exact for every rank a <=16 cutoff can
    produce — the reciprocal-rank checksum never rounds."""
    for r in range(1, 17):
        assert 720720 % r == 0, r
