"""Iterative graph analytics on DataFrames (Pregel-on-DataFrames shape,
same family as operators/routing.shortest_paths and
operators/cluster.connected_components).

PageRank (fixed-iteration, damping d): each round is

    contributions = edges ⋈ pr ⋈ out-degree   (pr(u)/deg(u) per edge)
    pr'           = (1-d)/N + d · Σ_in contributions

Scale design (100 TB):
- every round shuffles on the SAME vertex key (join + groupBy), so a
  bucketed-at-rest adjacency makes rounds co-located joins;
- rounds are localCheckpoint-ed: iterative lineage otherwise grows
  O(rounds) and re-executes the whole prefix per action (the classic
  iterative-Spark trap, same mitigation as routing.shortest_paths);
- N (vertex count) is the only driver-side scalar — model-sized;
- fixed iteration count (not convergence polling) keeps the plan
  deterministic and cross-engine replayable: a DuckDB oracle can unroll
  the same N rounds as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame, d: float = 0.85, n_iter: int = 3
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list ``(u, v)``.

    The vertex set is the UNION of both endpoints, so sink vertices
    (incoming edges only) receive and report rank. Dangling mass is
    NOT redistributed: a sink's own rank stays with it instead of
    spreading uniformly, the common simplification — pass both edge
    directions for an undirected graph and the question disappears
    (every vertex then has out-degree ≥ 1, total mass stays 1).

    Returns (node_id, pr float32): double math inside the rounds, f32
    at the surface (per-group float sums differ in final ulps across
    engines/partition orders; SURVEY.md §5.2 float policy).
    """
    # The edge list is often an upstream JOIN (the trading entry builds
    # it from orders⋈lineitem): checkpoint it ONCE so each rank round
    # shuffles the materialized (u, v) pairs instead of re-running the
    # whole upstream plan per iteration (measured 51 s → the edge build
    # dominated every round at the sf1 rehearsal). deg/verts derive
    # from the checkpointed frame and are checkpointed too — both are
    # joined every round.
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    verts = (
        edges.select("u")
        .unionByName(edges.select(F.col("v").alias("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    pr = verts.select(F.col("u").alias("node_id"), F.lit(1.0 / n).alias("pr"))
    for _ in range(n_iter):
        contrib = (
            edges.join(pr.withColumnRenamed("node_id", "u"), "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node_id"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            .groupBy("node_id")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            verts.select(F.col("u").alias("node_id"))
            .join(contrib, "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("node_id", F.col("pr").cast("float").alias("pr"))


def triangle_participation(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph given
    as distinct ``(a, b)`` pairs with ``a < b`` (no self-loops).
    Returns (node_id, n_triangles) for nodes in ≥1 triangle.

    Public scheme: degree-ordered orientation (Schank & Wagner 2005 /
    Latapy 2008 — the standard distributed triangle counter, e.g.
    GraphX/Galois): direct every edge from its lower-(degree, id)
    endpoint to the higher, enumerate wedges u→v1, u→v2 with
    (deg,id)-order v1 < v2, and close them against the oriented edge
    v1→v2. Every triangle is found exactly once, and wedge fan-out is
    bounded by the ORIENTED out-degree ≤ O(√m) on any graph — hub
    vertices never enumerate their quadratic neighbor pairs (the
    reason naive id-ordered wedge enumeration dies on skewed graphs
    at scale; id-ordering bounds nothing, a low-id hub still fans
    out deg² wedges).

    All shuffles are on vertex/edge keys (join + groupBy, AQE-skew
    safe); counts are exact integers — a DuckDB oracle can enumerate
    triangles with a different (id-ordered) scheme and match the hash,
    cross-checking the orientation logic.
    """
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("a").alias("x"))
        .unionByName(edges.select(F.col("b").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("dx"))
    )
    # orient by (degree, id): lower endpoint keeps the tail
    e = (
        edges.join(deg.withColumnRenamed("x", "a").withColumnRenamed("dx", "da"), "a")
        .join(deg.withColumnRenamed("x", "b").withColumnRenamed("dx", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("u"), F.col("b").alias("v"),
                    F.col("da").alias("du"), F.col("db").alias("dv"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("u"), F.col("a").alias("v"),
                    F.col("db").alias("du"), F.col("da").alias("dv"),
                )
            )
            .alias("o")
        )
        .select("o.u", "o.v", "o.du", "o.dv")
        .localCheckpoint(eager=True)
    )
    e1, e2 = e.alias("e1"), e.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u"))
        & (
            (F.col("e1.dv") < F.col("e2.dv"))
            | ((F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v")))
        ),
    ).select(
        F.col("e1.u").alias("w0"),
        F.col("e1.v").alias("w1"),
        F.col("e2.v").alias("w2"),
    )
    closing = e.select(F.col("u").alias("w1"), F.col("v").alias("w2"))
    tri = wedges.join(closing, ["w1", "w2"], "left_semi")
    return (
        tri.select(F.explode(F.array("w0", "w1", "w2")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
