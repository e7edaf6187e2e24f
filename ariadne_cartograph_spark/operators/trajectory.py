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
    one by pair), same plan shape as ngram_jaccard_pairs."""
    cells = trajectory_cells(pts, traj_col, lng_col, lat_col, cell_deg)
    sizes = cells.groupBy(traj_col).agg(F.count(F.lit(1)).alias("n_cells"))
    a = cells.alias("a")
    # shuffle_hash: SF-scaling cell self-join (see dedup.lsh_candidate_pairs).
    b = cells.hint("shuffle_hash").alias("b")
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
    return (
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
