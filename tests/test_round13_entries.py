"""Round-13 catalog additions, pinned against independent pure-Python
references: degree-ordered triangle counting (hub graphs + degree
ties — the regimes where the orientation logic earns its keep),
MAD outlier detection (interpolated medians on integer cents), and
embedding dimension correlation (vs numpy corrcoef)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators.graph import triangle_participation


def _py_triangles(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({x for e in edges for x in e})
    out: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edges and (a, c) in edges and (b, c) in edges:
            for x in (a, b, c):
                out[x] = out.get(x, 0) + 1
    return out


def _run_triangles(spark, edges):
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    rows = triangle_participation(df).collect()
    return {r["node_id"]: r["n_triangles"] for r in rows}


def test_triangles_hub_graph(spark):
    # hub 0 connects to everything; spokes form a sparse ring — the
    # shape where id-ordered wedge enumeration fans out deg^2 from a
    # low-id hub but degree-ordering bounds it
    edges = {(0, i) for i in range(1, 12)}
    edges |= {(i, i + 1) for i in range(1, 11)}
    edges.add((1, 11))
    assert _run_triangles(spark, edges) == _py_triangles(edges)


def test_triangles_degree_ties_and_k4(spark):
    # K4 (every vertex degree 3 — all ties, orientation falls back to
    # id order) plus a disjoint triangle and an edge with no triangle
    edges = set(itertools.combinations([1, 2, 3, 4], 2))
    edges |= {(10, 11), (10, 12), (11, 12), (20, 21)}
    got = _run_triangles(spark, edges)
    assert got == _py_triangles(edges)
    assert got[1] == 3 and got[10] == 1 and 20 not in got


def test_triangles_random_graph_matches_brute(spark):
    import random

    rng = random.Random(13)
    nodes = list(range(30))
    edges = {
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.15
    }
    assert _run_triangles(spark, edges) == _py_triangles(edges)


def test_triangles_partition_independence(spark):
    edges = set(itertools.combinations([1, 2, 3, 4, 5], 2))  # K5
    base = None
    for parts in (1, 6):
        df = spark.createDataFrame(sorted(edges), "a long, b long").repartition(parts)
        got = {r["node_id"]: r["n_triangles"] for r in triangle_participation(df).collect()}
        base = got if base is None else base
        assert got == base
    assert base == {i: 6 for i in range(1, 6)}  # each K5 vertex in C(4,2)


def _py_mad(rows):
    import statistics

    out = {}
    by_t: dict[str, list[int]] = {}
    for t, cents in rows:
        by_t.setdefault(t, []).append(cents)
    for t, vals in by_t.items():
        med = statistics.median(vals)
        devs = [abs(v - med) for v in vals]
        mad = statistics.median(devs)
        outl = [v for v, d in zip(vals, devs) if d > 3 * mad]
        out[t] = (len(vals), len(outl), sum(outl))
    return out


def test_mad_outliers_matches_python(spark):
    import random

    rng = random.Random(5)
    rows = []
    for t in ("a", "b"):
        rows += [(t, rng.randint(900, 1100)) for _ in range(40)]
        rows += [(t, rng.randint(50_000, 60_000)) for _ in range(3)]  # outliers
    rows += [("c", 100), ("c", 102)]  # even count -> half-integer median
    df = spark.createDataFrame(
        [(t, c / 100.0) for t, c in rows], "event_type string, value double"
    )
    ev = df.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    med = ev.groupBy("event_type").agg(F.median("cents").alias("med"))
    dev = ev.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    is_out = F.col("adev") > 3 * F.col("mad")
    got = {
        r["event_type"]: (r["n"], r["n_out"], r["out_cents"])
        for r in dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_out"),
            F.sum(F.when(is_out, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("out_cents"),
        )
        .collect()
    }
    assert got == _py_mad(rows)
    assert got["a"][1] == 3  # the planted outliers are flagged
    assert got["c"][1] == 0  # 2-point groups have no MAD outliers


def test_scd2_reconstruction_hand_computed(spark, tmp_path):
    """SCD2 interval reconstruction on a hand-built 4-version history,
    including the gap case: key 30 is deleted at v3 and RE-INSERTED at
    v4 with its old value — a naive lag-only reconstruction would fuse
    [1,3) and [4,open) into one interval."""
    from pyspark.sql.window import Window as W

    from ariadne_cartograph_spark.operators.merge import ParquetMergeTable

    t = ParquetMergeTable(spark, str(tmp_path / "scd2"), key="gid", retain_versions=8)
    mk = lambda rows: spark.createDataFrame(rows, "gid long, price double")  # noqa: E731
    t.upsert(mk([(10, 1.0), (20, 2.0), (30, 3.0)]))          # v1
    t.upsert(mk([(20, 5.0), (40, 4.0)]))                     # v2: update + insert
    t.delete(spark.createDataFrame([(30,)], "gid long"))     # v3
    t.upsert(mk([(30, 3.0)]))                                # v4: re-insert, same value

    snaps = None
    for v in (1, 2, 3, 4):
        s = t.read(v).select("gid", "price", F.lit(v).alias("v"))
        snaps = s if snaps is None else snaps.unionByName(s)
    w = W.partitionBy("gid").orderBy("v")
    marked = snaps.select(
        "gid", "price", "v",
        F.when(
            F.lag("v").over(w).isNull()
            | (F.lag("v").over(w) != F.col("v") - 1)
            | (F.lag("price").over(w) != F.col("price")),
            1,
        ).otherwise(0).alias("is_start"),
    )
    seg = marked.withColumn(
        "seg",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    got = {
        (r["gid"], r["v_from"], r["v_to"], r["price"])
        for r in seg.groupBy("gid", "seg")
        .agg(F.min("v").alias("v_from"), F.max("v").alias("v_max"),
             F.max("price").alias("price"))
        .select(
            "gid", "price", "v_from",
            F.when(F.col("v_max") == 4, F.lit(None).cast("int"))
            .otherwise(F.col("v_max") + 1).alias("v_to"),
        )
        .collect()
    }
    assert got == {
        (10, 1, None, 1.0),   # untouched, open
        (20, 1, 2, 2.0),      # closed by the v2 update
        (20, 2, None, 5.0),
        (30, 1, 3, 3.0),      # closed by the v3 delete
        (30, 4, None, 3.0),   # re-inserted: SEPARATE interval, same value
        (40, 2, None, 4.0),
    }


def test_markov_transitions_hand_computed(spark):
    from datetime import datetime, timedelta
    from pyspark.sql.window import Window as W

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: a->b->b->c ; user 2: b->a ; user 3: single event (no pair)
    for i, (u, typ) in enumerate(
        [(1, "a"), (1, "b"), (1, "b"), (1, "c"), (2, "b"), (2, "a"), (3, "c")]
    ):
        rows.append((i, u, t0 + timedelta(seconds=i), typ))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy("prev", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("prev").agg(F.sum("n").cast("bigint").alias("tot"))
    got = {
        (r["prev"], r["event_type"]): (r["n"], r["prob"])
        for r in c.join(t, "prev")
        .select(
            "prev", "event_type", "n",
            (F.col("n").cast("double") / F.col("tot")).cast("float").alias("prob"),
        )
        .collect()
    }
    # prev 'b' has transitions b,c from user 1 AND a from user 2 -> tot 3
    assert got[("a", "b")] == (1, 1.0)
    assert got[("b", "b")][0] == 1 and abs(got[("b", "b")][1] - 1 / 3) < 1e-6
    assert got[("b", "c")][0] == 1 and abs(got[("b", "c")][1] - 1 / 3) < 1e-6
    assert got[("b", "a")][0] == 1 and abs(got[("b", "a")][1] - 1 / 3) < 1e-6
    assert ("c", None) not in got and len(got) == 4  # user 3 contributes none


def test_equidepth_histogram_properties(spark):
    # exact python model: boundaries by linear interpolation at
    # (n-1)*q, bucket = #boundaries strictly below v
    import numpy as np

    vals = [100, 100, 200, 300, 300, 300, 400, 500, 600, 700, 800, 900, 1000]
    qs = [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]
    bnd = [float(np.quantile(vals, q, method="linear")) for q in qs]
    want: dict[int, list[int]] = {}
    for v in vals:
        b = sum(v > x for x in bnd)
        want.setdefault(b, []).append(v)
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    bdf = df.agg(F.percentile("cents", F.array(*[F.lit(q) for q in qs])).alias("bnd"))
    bucket = F.size(
        F.filter(F.col("bnd"), lambda x: F.col("cents").cast("double") > x)
    ).cast("int")
    got = {
        r["bucket"]: (r["n"], r["mn"], r["mx"])
        for r in df.crossJoin(F.broadcast(bdf))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("cents").alias("mn"), F.max("cents").alias("mx"))
        .collect()
    }
    assert got == {b: (len(v), min(v), max(v)) for b, v in want.items()}
    assert sum(n for n, _, _ in got.values()) == len(vals)


def test_zipf_ols_matches_numpy_polyfit(spark):
    # synthetic corpus with exact power-law counts: token w_r appears
    # floor(5000 / r) times; OLS of ln(n)~ln(r) must match numpy's fit
    import numpy as np
    from pyspark.sql.window import Window as W

    counts = {f"w{r:03d}": 5000 // r for r in range(1, 101)}
    rows = [(tok, n) for tok, n in counts.items()]
    c = spark.createDataFrame(rows, "tok string, n long")
    top = (
        c.orderBy(F.desc("n"), F.asc("tok"))
        .limit(1000)
        .withColumn("r", F.row_number().over(W.orderBy(F.desc("n"), F.asc("tok"))))
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("n").cast("double"))
    f = top.agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
    ).first()
    den = f["v"] * f["sxx"] - f["sx"] ** 2
    slope = (f["v"] * f["sxy"] - f["sx"] * f["sy"]) / den
    intercept = (f["sy"] * f["sxx"] - f["sx"] * f["sxy"]) / den
    rr = np.arange(1, 101)
    nn = np.array([5000 // r for r in rr])
    np_slope, np_intercept = np.polyfit(np.log(rr), np.log(nn), 1)
    assert abs(slope - np_slope) < 1e-9
    assert abs(intercept - np_intercept) < 1e-9
    assert -1.05 < slope < -0.95  # the corpus is Zipf(1) by construction


def test_dim_correlation_matches_numpy(spark):
    from ariadne_cartograph_spark.operators.pca import gram_matrix, quantize_vec

    rng = np.random.RandomState(3)
    base = rng.randn(200, 5)
    base[:, 3] = base[:, 0] * 0.9 + rng.randn(200) * 0.1  # correlated pair
    base[:, 4] = 0.25  # constant dim -> quantizes to one value -> NULL
    rows = [([float(v) for v in x],) for x in base.astype(np.float32)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    qa = F.concat(quantize_vec(F.col("embedding")), F.array(F.lit(1).cast("long")))
    G = gram_matrix(df.select(qa.alias("q")), "q")
    d = len(G) - 1
    n, S = G[d][d], [G[i][d] for i in range(d)]
    Q = np.floor(base.astype(np.float32).astype(np.float64) * 1024.0 + 0.5)
    C = np.corrcoef(Q, rowvar=False)
    import math

    for i in range(d):
        dx = n * G[i][i] - S[i] * S[i]
        for j in range(i + 1, d):
            dy = n * G[j][j] - S[j] * S[j]
            num = n * G[i][j] - S[i] * S[j]
            if dx == 0 or dy == 0:
                assert 4 in (i, j)  # only the constant dim degenerates
                continue
            c = float(num) / math.sqrt(float(dx) * float(dy))
            assert abs(c - C[i][j]) < 1e-9
    assert abs(float(n * G[0][3] - S[0] * S[3])
               / math.sqrt(float(n * G[0][0] - S[0] ** 2)
                           * float(n * G[3][3] - S[3] ** 2))) > 0.85
