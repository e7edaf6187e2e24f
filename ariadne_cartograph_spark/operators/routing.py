"""Distributed shortest-path over the routable edge table — the
pgRouting query surface the reference's `ways` import exists to serve
(`/root/reference/README.md:41-54`: osm2pgrouting + pgr_dijkstra-style
routing is the documented consumer of the topology tables).

Algorithm: frontier-based iterative relaxation (delta-less
Bellman-Ford / BFS when unweighted) expressed as DataFrame joins —
the standard Pregel-on-DataFrames shape:

    frontier ⋈ adjacency → candidate dists → min-merge into dist table

Scale design (100 TB):
- each iteration is ONE equi-join keyed on vertex id + one groupBy
  min — both shuffle on the same key, so pre-partitioning the
  adjacency list by `u` (bucketing at rest) makes every round a
  co-located join with only the (small) frontier moving;
- the dist/frontier frames are `localCheckpoint`-ed per round:
  iterative lineage otherwise grows O(rounds) and re-executes the
  whole prefix at every action (the classic iterative-Spark trap);
- termination is frontier-emptiness — a driver-side `count()` on the
  (shrinking) frontier, not on the full dist table;
- `max_iter` bounds the sync rounds (graph diameter): street graphs
  are high-diameter, so production routing engines partition by region
  (contraction hierarchies etc. are out of scope — this is the exact
  parallel baseline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def edge_adjacency(
    edges: DataFrame,
    weight: Column | None = None,
    directed: bool = False,
) -> DataFrame:
    """(u, v, w) adjacency from the topology's edge table. Undirected
    by default (osm2pgrouting emits cost + reverse_cost per edge; the
    fixture's ways carry no oneway handling here — documented
    simplification)."""
    w = (weight if weight is not None else F.lit(1.0)).alias("w")
    fwd = edges.select(F.col("source").alias("u"), F.col("target").alias("v"), w)
    if directed:
        return fwd
    rev = edges.select(F.col("target").alias("u"), F.col("source").alias("v"), w)
    return fwd.unionByName(rev)


def cost_adjacency(edges: DataFrame) -> DataFrame:
    """Directed (u, v, w) adjacency from :func:`topology.edge_costs`
    output: forward arcs at ``cost_s``; backward arcs only where
    ``reverse_cost_s >= 0`` (pgRouting's ``-1`` marks oneway edges as
    non-traversable backwards). This is the real cost model the
    reference's enrichment exists to feed — per-class travel time, not
    unit hops."""
    fwd = edges.select(
        F.col("source").alias("u"), F.col("target").alias("v"),
        F.col("cost_s").alias("w"),
    )
    rev = edges.filter(F.col("reverse_cost_s") >= 0).select(
        F.col("target").alias("u"), F.col("source").alias("v"),
        F.col("reverse_cost_s").alias("w"),
    )
    return fwd.unionByName(rev)


def shortest_paths(
    adj: DataFrame,
    source_vertices: list[int],
    max_iter: int = 50,
) -> DataFrame:
    """Single/multi-source shortest paths by synchronous relaxation.

    Returns (node_id, dist, hops) for every vertex reached within
    ``max_iter`` rounds. With unit weights this is BFS and `hops` ==
    `dist`; with real weights it is Bellman-Ford (non-negative weights
    assumed, as in road networks).
    """
    spark = adj.sparkSession
    seed = spark.createDataFrame(
        [(int(v), 0.0, 0) for v in source_vertices], "node_id long, dist double, hops int"
    ).localCheckpoint(eager=True)
    # `rounds` holds one ALREADY-MATERIALIZED improvement frame per
    # iteration; the running dist view is their lazy union (scanning
    # checkpointed leaves — no recompute, no per-round full-table
    # checkpoint action). One localCheckpoint per round is the only job.
    rounds = [seed]
    frontier = seed

    def dist_view() -> DataFrame:
        out = rounds[0]
        for r in rounds[1:]:
            out = out.unionByName(r)
        return out

    for _ in range(max_iter):
        cand = (
            frontier.join(adj, frontier["node_id"] == adj["u"])
            .select(
                F.col("v").alias("node_id"),
                (F.col("dist") + F.col("w")).alias("dist"),
                (F.col("hops") + 1).alias("hops"),
            )
            .groupBy("node_id")
            .agg(F.min_by(F.struct("dist", "hops"), "dist").alias("s"))
            .select("node_id", F.col("s.dist").alias("dist"), F.col("s.hops").alias("hops"))
        )
        # improved = candidates strictly better than any settled dist
        best = dist_view().groupBy("node_id").agg(F.min("dist").alias("old"))
        improved = (
            cand.join(best, "node_id", "left")
            .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("node_id", "dist", "hops")
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        rounds.append(improved)
        frontier = improved
    return (
        dist_view()
        .groupBy("node_id")
        .agg(F.min_by(F.struct("dist", "hops"), "dist").alias("s"))
        .select("node_id", F.col("s.dist").alias("dist"), F.col("s.hops").alias("hops"))
    )
