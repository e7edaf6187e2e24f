"""Trajectory similarity (PAPERS.md: REPOSE-style distributed top-k
trajectory similarity): trajectories are reduced to grid-cell
signature SETS (the local-reference-point idea — a coarse spatial
vocabulary), so trajectory similarity becomes set similarity and rides
the same count-based / LSH machinery as document dedup.

Scale design: the cell explode-join is the document-shingle join with
cells as the vocabulary — Σ df(cell)² bounded by cell coarseness;
hotspots (downtown cells everyone visits) are the skew case and take
the AllPairs prefix-filter route exactly like hot shingles
(operators/dedup.py). Cell ids are pure integer arithmetic
(floor(coord/cell_deg)) — deterministic across engines, hence
DuckDB-oracle-checkable, unlike hash-based shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import grid_cell

# cx ∈ [-360/deg, 360/deg]; ×1e6 keeps the pair injective for any
# cell_deg ≥ 1e-3 while staying far from long overflow.
_CELL_ENC = 1_000_000


def cell_id(lng: F.Column, lat: F.Column, cell_deg: float) -> F.Column:
    cx, cy = grid_cell(lng, lat, cell_deg)
    return cx * _CELL_ENC + cy


def trajectory_cells(
    pts: DataFrame,
    traj_col: str,
    lng_col: str,
    lat_col: str,
    cell_deg: float,
) -> DataFrame:
    """Point rows → distinct (trajectory, cell) pairs — the exploded
    signature-set relation."""
    return pts.select(
        F.col(traj_col),
        cell_id(F.col(lng_col), F.col(lat_col), cell_deg).alias("cell"),
    ).dropDuplicates()


def trajectory_jaccard_pairs(
    pts: DataFrame,
    traj_col: str,
    lng_col: str,
    lat_col: str,
    cell_deg: float = 10.0,
    threshold: float = 0.6,
) -> DataFrame:
    """All trajectory pairs with cell-signature Jaccard ≥ threshold:
    count-based intersection join on cell (one shuffle keyed by cell,
    one by pair), same plan shape as ngram_jaccard_pairs.

    Duplicate-collapse pre-pass: trajectories with IDENTICAL cell
    signatures (exact duplicates — the dominant population on crawl-
    style corpora; the sf1 replica rehearsal measured this entry at
    1160s without it, with every candidate evaluated 100x) are
    collapsed to their min-id representative before pair enumeration.
    The pair join runs over representatives only; the full pair set is
    reconstructed after — cross-cluster pairs inherit the rep pair's
    jaccard (identical signatures), intra-cluster pairs are emitted
    directly at jaccard 1.0. Output is row-identical to the naive
    plan; candidate work drops from Σ(k·df)² to Σ df² for k-fold
    duplicated corpora. Signature equality uses xxhash64 of the sorted
    cell array (2^-64 collision class, like every hashed scheme here).
    """
    cells = trajectory_cells(pts, traj_col, lng_col, lat_col, cell_deg)
    sig = cells.groupBy(traj_col).agg(
        F.xxhash64(F.sort_array(F.collect_list("cell"))).alias("__sig")
    )
    reps = sig.groupBy("__sig").agg(F.min(traj_col).alias("__rep"))
    member = sig.join(reps, "__sig").select(traj_col, "__rep", "__sig")
    # No broadcast hint: on a dup-free corpus reps is corpus-sized
    # (SF-scaling); AQE broadcasts it only when the collapse actually
    # shrank it.
    rep_cells = cells.join(
        reps.select(F.col("__rep").alias(traj_col)), traj_col, "left_semi"
    )
    sizes = rep_cells.groupBy(traj_col).agg(F.count(F.lit(1)).alias("n_cells"))
    a = rep_cells.alias("a")
    # shuffle_hash: SF-scaling cell self-join (see dedup.lsh_candidate_pairs).
    b = rep_cells.hint("shuffle_hash").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{traj_col}") < F.col(f"b.{traj_col}")),
        )
        .groupBy(F.col(f"a.{traj_col}").alias("id_a"), F.col(f"b.{traj_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(traj_col).alias("id_a"), F.col("n_cells").alias("n_a"))
    sb = sizes.select(F.col(traj_col).alias("id_b"), F.col("n_cells").alias("n_b"))
    rep_pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # Cross-cluster expansion: every member pair across the two rep
    # clusters, re-ordered so id_a < id_b (identical signatures make
    # the rep jaccard exact for every member pair).
    ma = member.select(F.col("__rep").alias("id_a"), F.col(traj_col).alias("__ma"))
    mb = member.select(F.col("__rep").alias("id_b"), F.col(traj_col).alias("__mb"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            "jaccard",
        )
    )
    # Intra-cluster pairs: exact duplicates, jaccard 1.0 by definition.
    m1 = member.alias("m1")
    m2 = member.hint("shuffle_hash").alias("m2")
    intra = (
        m1.join(
            m2,
            (F.col("m1.__sig") == F.col("m2.__sig"))
            & (F.col(f"m1.{traj_col}") < F.col(f"m2.{traj_col}")),
        )
        .select(
            F.col(f"m1.{traj_col}").alias("id_a"),
            F.col(f"m2.{traj_col}").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def trajectory_topk_similar(
    pts: DataFrame,
    traj_col: str,
    lng_col: str,
    lat_col: str,
    query_ids: list,
    k: int = 5,
    cell_deg: float = 10.0,
) -> DataFrame:
    """Top-k most similar trajectories for each query trajectory
    (REPOSE's query shape): restrict one join side to the query set —
    the corpus side shuffles once on cell regardless of |queries|."""
    from pyspark.sql.window import Window as W

    cells = trajectory_cells(pts, traj_col, lng_col, lat_col, cell_deg)
    sizes = cells.groupBy(traj_col).agg(F.count(F.lit(1)).alias("n_cells"))
    q = cells.filter(F.col(traj_col).isin(query_ids))
    inter = (
        q.alias("q")
        .join(
            cells.alias("c"),
            (F.col("q.cell") == F.col("c.cell"))
            & (F.col(f"q.{traj_col}") != F.col(f"c.{traj_col}")),
        )
        .groupBy(F.col(f"q.{traj_col}").alias("q_id"), F.col(f"c.{traj_col}").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sq = sizes.select(F.col(traj_col).alias("q_id"), F.col("n_cells").alias("n_q"))
    sc = sizes.select(F.col(traj_col).alias("id"), F.col("n_cells").alias("n_c"))
    scored = (
        inter.join(sq, "q_id")
        .join(sc, "id")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_q") + F.col("n_c") - F.col("n_inter")).cast("double"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("jaccard"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "jaccard", "rank")
    )
