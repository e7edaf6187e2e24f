"""Near-duplicate cluster resolution — the step AFTER pair finding in
a training-data dedup pipeline: near-dup pairs form a similarity graph
whose connected components are the duplicate clusters; one canonical
document (min id) is kept per cluster.

Scale design (100 TB): min-label propagation over the pair graph.
Each round is one groupBy + one join, both shuffling on the node id —
never materializing anything larger than the edge list. Rounds needed
= graph diameter; near-dup components are short chains (diameter ≤ a
few hops — a transitive chain a~b~c of jaccard-0.6 pairs), so the
default cap of 15 rounds is far past convergence. Convergence is
checked with a 1-row count aggregate per round (a bounded model
statistic, not a data collect); the driver-side loop is O(diameter)
bounded jobs — the standard Spark shape for iterative graph algorithms
(same structure GraphX/Pregel uses under the hood).

No reference-repo counterpart (the reference delegates all querying to
PostGIS, /root/reference/README.md:29-38); this is part of the
LLM-data-pipeline surface the rebuild contract adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Label every node of the undirected pair graph with the MIN node
    id reachable from it. Returns (id, component).

    Min-label propagation: start with label(v) = min(v, neighbors(v)),
    then each round pulls the min label over {self} ∪ neighbors until a
    fixpoint. Each round shuffles the edge list once (join on src) and
    aggregates once (groupBy dst) — both keyed on node ids, so AQE
    handles skewed hub nodes the same way it handles any hot key.

    Raises RuntimeError if ``max_iter`` rounds don't reach the
    fixpoint (diameter > max_iter — raise the cap for pathological
    graphs; near-dup graphs converge in a handful of rounds).

    Every round ends in ``localCheckpoint(eager=True)``: the labels
    frame references itself twice per round (neighbor pull + merge),
    so without lineage TRUNCATION the logical plan doubles every
    iteration and Catalyst analysis goes exponential long before
    execution is the bottleneck — caching alone does not cut the
    logical plan. (On a fault-tolerant cluster run, swap for
    ``checkpoint()`` against a reliable dir: localCheckpoint blocks
    die with their executor.)
    """
    # Undirected: materialize both directions once.
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.col("u")).alias("comp"))
        .select(F.col("u").alias("id"), "comp")
        .localCheckpoint(eager=True)
    )
    # Labels only ever decrease, so sum(comp) is strictly monotone
    # until the fixpoint: an unchanged sum IS convergence — one
    # scalar aggregate per round, no label-vs-label self-join.
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    for _ in range(max_iter):
        # Pull the min neighbor label; keep own label if smaller.
        pulled = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        labels = (
            labels.join(pulled, labels.id == pulled.u, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds "
        "(graph diameter exceeds cap — raise max_iter)"
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplicate clusters from a near-dup pair list: one row per
    cluster (component) with the canonical keeper (min id — matching
    dedup_exact's deterministic-representative convention), the member
    count and the full sorted member list. Singleton documents (no
    pair) are by definition their own keeper and are not emitted."""
    comp = connected_components(pairs, src, dst)
    return (
        comp.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("id")).alias("members"),
        )
        .select(
            F.col("comp").alias("keep_id"),
            "n_members",
            "members",
        )
    )


def keep_best_per_cluster(
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Quality-aware canonical selection: per duplicate cluster keep
    the member with the HIGHEST quality score (ties broken by min id —
    fully deterministic). Production dedup keeps the best member of a
    near-dup cluster, not an arbitrary one: near-duplicates differ in
    truncation, boilerplate, and OCR noise, and min-id throws that
    signal away.

    ``scores`` must carry a score for every id that appears in
    ``pairs`` (an inner join drops unscored members — score the corpus
    first). Returns (cluster_id, keep_id, keep_score, n_members,
    members).

    Scale: one label-propagation pass (see connected_components), one
    keyed join to attach scores, one hash aggregate. The argmax is a
    single ``max(struct(score, -id))`` — partial-aggregable map-side,
    no per-cluster window sort, so a cluster with a million members
    costs the same shuffle as any other groupBy key (AQE handles the
    hot key)."""
    comp = connected_components(pairs, src, dst)
    scored = comp.join(
        scores.select(F.col(id_col).alias("id"), F.col(score_col).alias("__score")),
        "id",
    )
    return (
        scored.groupBy("comp")
        .agg(
            F.max(
                F.struct(F.col("__score").alias("s"), (-F.col("id")).alias("negid"))
            ).alias("__best"),
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("id")).alias("members"),
        )
        .select(
            F.col("comp").alias("cluster_id"),
            (-F.col("__best.negid")).alias("keep_id"),
            F.col("__best.s").alias("keep_score"),
            "n_members",
            "members",
        )
    )
