"""Incremental (streaming) near-duplicate filtering — the online form
of corpus dedup: every arriving batch of documents is checked against
everything seen so far, duplicates are dropped, and the index grows by
the batch. This is what a crawl-ingest pipeline runs continuously; the
batch operators in operators/dedup.py are its offline twin.

Contract (deterministic given the arrival order, partition-
independent within a batch): a document is DROPPED iff it has a
verified near-duplicate (exact Jaccard >= threshold among MinHash-LSH
candidates) with (i) ANY already-stored document — arrival precedence
— or (ii) a SMALLER-id document in its own batch. When batches arrive
in id order this equals the pure offline rule "keep iff no smaller-id
neighbor" (pinned in tests/test_incremental_dedup.py); out-of-order
arrival degrades gracefully to first-arrival-wins precedence. The
per-edge predicate is chosen over sequential greedy ("keep iff no
previously-KEPT neighbor") on purpose: greedy has a sequential
dependency chain that needs diameter-many rounds, while this rule is
one join. On transitive in-batch chains A~B~C (A!~C) greedy keeps C
where this rule drops it: a documented over-drop, the standard trade
for distributed determinism.

State is a parquet directory of (doc_id, band_idx, band_hash, sh):
append-only, partition-friendly, and shared-nothing — at scale the
band columns are the natural partition/bucket keys so each batch's
probe is a co-located join against the store instead of a broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hashed_word_shingles
from ..operators.dedup import _minhash_from_shingles


def _index_batch(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_size: int,
) -> DataFrame:
    """(id, sh, band_idx, band_hash) rows for a batch — the unit the
    store accumulates. One row per (doc, band)."""
    r = n_hashes // bands
    sh = batch.select(
        F.col(id_col), hashed_word_shingles(text_col, n=shingle_size).alias("sh")
    )
    sigs = sh.withColumn("mh_sig", _minhash_from_shingles(F.col("sh"), n_hashes))
    return sigs.select(
        F.col(id_col),
        F.col("sh"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("mh_sig")[b * r + j] for j in range(r)])
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def incremental_near_dup_filter(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Filter ``batch`` against the accumulated store, RETURN the kept
    rows, and append the batch's index rows to the store (all batch
    docs — dropped ones too, so later arrivals dedup against them).

    The store join is new-bands vs (stored + in-batch) bands on
    (band_idx, band_hash) with the smaller-id restriction; candidates
    are verified with exact Jaccard on the stored shingle sets.
    """
    idx_new = _index_batch(
        batch, id_col, text_col, n_hashes, bands, shingle_size
    ).localCheckpoint(eager=True)

    # stored rows match ANY new doc (arrival precedence); in-batch rows
    # only match LARGER-id new docs
    probe_side = idx_new.withColumn("__stored", F.lit(False))
    if os.path.isdir(store_dir) and any(
        f.endswith(".parquet") for f in os.listdir(store_dir)
    ):
        stored = spark.read.schema(idx_new.schema).parquet(store_dir)
        probe_side = stored.withColumn("__stored", F.lit(True)).unionByName(
            probe_side
        )

    a = idx_new.alias("a")  # the NEW doc
    b = probe_side.alias("b")
    # Candidate pairs dedupe on IDS ONLY — shingle arrays through the
    # distinct would shuffle duplicated sets per matching band (the
    # same scale bug class as vector-wide LSH distincts); shingles are
    # re-fetched by id afterward.
    pair_ids = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (
                F.col("b.__stored")
                | (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("new_id"),
            F.col(f"b.{id_col}").alias("old_id"),
        )
        .distinct()
    )
    sh_new = idx_new.select(
        F.col(id_col).alias("new_id"), F.col("sh").alias("sh_new")
    ).dropDuplicates(["new_id"])
    sh_old = probe_side.select(
        F.col(id_col).alias("old_id"), F.col("sh").alias("sh_old")
    ).dropDuplicates(["old_id"])
    cands = pair_ids.join(sh_new, "new_id").join(sh_old, "old_id")
    inter = F.size(F.array_intersect("sh_new", "sh_old")).cast("double")
    union = (F.size("sh_new") + F.size("sh_old")).cast("double") - inter
    dropped = (
        cands.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
        # materialize BEFORE the store append below: the returned
        # ``kept`` frame must never observe this batch's own index
        # rows through a re-read of the store directory
        .localCheckpoint(eager=True)
    )
    kept = batch.join(dropped, id_col, "left_anti")
    idx_new.write.mode("append").parquet(store_dir)
    return kept


def run_incremental_dedup(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """T6-style wiring: foreachBatch(incremental_near_dup_filter) —
    kept rows append to ``out_dir``, the index accumulates in
    ``store_dir``. availableNow drains the backlog and stops."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        kept = incremental_near_dup_filter(
            batch.sparkSession, batch, store_dir, **kwargs
        )
        kept.write.mode("append").parquet(out_dir)

    (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
