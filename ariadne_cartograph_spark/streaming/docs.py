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

State is TWO parquet tables under ``store_dir`` so that per-batch cost
is O(batch + candidates), never O(store):

- ``bands/`` — (doc_id, band_idx, band_hash): the LSH probe side. One
  narrow row per (doc, band); at scale (band_idx, band_hash) are the
  natural partition/bucket keys so each batch's probe is a co-located
  join against the store instead of a broadcast. No shingle arrays
  ride along, so the band join shuffles ids only.
- ``shingles/`` — (doc_id, sh, __fp, __n) partitioned by ``__bucket =
  pmod(xxhash64(doc_id), N_BUCKETS)``: exactly one row per document,
  read back ONLY for verified-candidate ids via a broadcast semi-join
  whose bucket key enables dynamic partition pruning — the scan
  touches the candidate buckets, not the corpus. ``__fp`` (xxhash64 of
  the sorted shingle set) and ``__n`` (set size) are computed ONCE at
  append so the per-batch verify decides exact-duplicate pairs and
  Jaccard denominators on narrow columns without re-sorting or
  re-sizing stored arrays (r13/r14; store format is internal —
  pre-r13 dirs lack the columns and the read guard in ``_dropped_ids``
  rejects them with a rebuild instruction).

Each batch appends small files per bucket; a long-lived ingest
compacts them periodically with ``sources.layout.compact_parquet_dir``
(orthogonal to correctness — append order never matters here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hashed_word_shingles
from ..operators.dedup import _minhash_from_shingles

# Shingle-store partition fanout — the knob that bounds per-batch
# pruning granularity (candidate ids hit ~min(|candidates|, N_BUCKETS)
# partitions). 16 over 64: every batch's shingle append pays one
# partition-directory commit per bucket DRIVER-SIDE (the 4-batch sf1
# replay is driver-overhead bound, ~90 jobs), and on crawl corpora the
# candidate set hits most buckets anyway, so finer pruning bought
# nothing the semi-join + min/max skipping don't already give. At
# cluster scale raise it with the store size; correctness is
# bucket-count independent (the bucket id is recomputed from the key).
N_BUCKETS = 16


def _bucket(col: F.Column) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def set_fingerprint(col: str) -> F.Column:
    """xxhash64 over the sorted shingle set — the exact-duplicate
    short-circuit key. Computed once per doc at store-append time and
    persisted (``__fp``), so later batches never re-sort stored
    arrays."""
    return F.xxhash64(F.array_sort(F.col(col)))


def _index_batch(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_size: int,
) -> DataFrame:
    """(id, sh, band_idx, band_hash) rows for a batch — one row per
    (doc, band). The batch-sized working set both store tables derive
    from (``sh`` repeats per band here, but only within the batch —
    the persisted bands table strips it)."""
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


def _dropped_ids(
    spark: SparkSession,
    idx_new: DataFrame,
    store_dir: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Ids of batch docs with a verified near-duplicate. Lazy; every
    shuffle in this plan is candidate- or batch-sized:

    - the band probe joins new bands against (stored + in-batch) bands
      carrying IDS ONLY (no shingle arrays through the exchange);
    - the stored-shingle fetch is a broadcast LeftSemi of candidate ids
      against the bucket-partitioned shingles table (dynamic partition
      pruning keys the scan on the candidate buckets) — never a
      store-wide aggregate.
    """
    bands_dir = os.path.join(store_dir, "bands")
    sh_dir = os.path.join(store_dir, "shingles")

    new_bands = idx_new.select(id_col, "band_idx", "band_hash").withColumn(
        "__stored", F.lit(False)
    )
    probe_side = new_bands
    if os.path.isdir(bands_dir):
        stored_bands = spark.read.schema(
            idx_new.select(id_col, "band_idx", "band_hash").schema
        ).parquet(bands_dir)
        probe_side = stored_bands.withColumn("__stored", F.lit(True)).unionByName(
            new_bands
        )

    a = idx_new.alias("a")  # the NEW doc
    b = probe_side.alias("b")
    # Candidate pairs dedupe on IDS ONLY — shingle arrays through the
    # distinct would shuffle duplicated sets per matching band (the
    # same scale bug class as vector-wide LSH distincts); shingles are
    # re-fetched by id afterward. Checkpointed because both the verify
    # join and the candidate-id fetch consume it.
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
        # repartition BEFORE distinct: hash partitioning on new_id
        # satisfies the distinct's ClusteredDistribution(new_id, old_id)
        # (subset rule), so the aggregate runs exchange-free on the
        # repartitioned data — ONE shuffle where distinct-then-
        # repartition paid two, and the output is already spread by
        # new_id for the verify join (this loop is driver-overhead
        # bound at local scale: ~90 jobs per 4-batch replay, so every
        # elided exchange is an AQE materialization saved).
        .repartition(spark.sparkContext.defaultParallelism, "new_id")
        .distinct()
        # The explicit repartition above also pins the spread the
        # checkpoint freezes: without it AQE coalesced the distinct's
        # output to ONE partition when the pair ids compressed small,
        # and the verify join's intersect CPU ran single-threaded
        # (measured 2.8 s → 0.6 s per sf1 batch). Eager on purpose:
        # lazy localCheckpoints measured SLOWER here (both this frame
        # and idx_new are referenced twice inside their first
        # consumer's plan, which defeats single-pass materialization).
        .localCheckpoint(eager=True)
    )

    # One shingle row per doc via band_idx == 0 — a narrow filter, not
    # a dropDuplicates shuffle. The in-batch side computes its set
    # fingerprint here; the stored side reads the PRECOMPUTED __fp off
    # the store (r13 — previously every batch re-ran
    # xxhash64(array_sort(sh)) over every fetched stored candidate).
    sh_new = idx_new.filter(F.col("band_idx") == 0).select(
        F.col(id_col).alias("new_id"),
        F.col("sh").alias("sh_new"),
        set_fingerprint("sh").alias("__fp_n"),
        F.size("sh").alias("__n_n"),
    )
    sh_old = idx_new.filter(F.col("band_idx") == 0).select(
        F.col(id_col).alias("old_id"),
        F.col("sh").alias("sh_old"),
        set_fingerprint("sh").alias("__fp_o"),
        F.size("sh").alias("__n_o"),
    )
    if os.path.isdir(sh_dir):
        cand_old = (
            pair_ids.select("old_id")
            .distinct()
            .withColumn("__cb", _bucket(F.col("old_id")))
        )
        # Candidate buckets as STATIC partition filters: at most
        # N_BUCKETS ints (a model-sized collect off the checkpointed
        # candidate set, same class as skew counters) — deterministic
        # partition pruning on the shingle scan, no reliance on DPP
        # heuristics over stat-less checkpoints.
        buckets = [r["__cb"] for r in cand_old.select("__cb").distinct().collect()]
        if buckets:
            stored_sh = spark.read.parquet(sh_dir)
            # Store-format guard (r14): pre-r13 stores lack __fp/__n —
            # without this check the select below dies mid-batch with
            # an opaque unresolved-column error. Footer-only schema
            # inspection, no data read.
            missing = {"__fp", "__n"} - set(stored_sh.columns)
            if missing:
                raise ValueError(
                    f"shingle store at {sh_dir} predates the r13 format "
                    f"(columns {sorted(missing)} absent) — the index is "
                    "derivable from the corpus: delete store_dir and "
                    "replay the stream to rebuild"
                )
            stored_sh = stored_sh.filter(F.col("__bucket").isin(buckets))
            stored_cand = (
                stored_sh.join(
                    F.broadcast(cand_old),
                    (stored_sh["__bucket"] == cand_old["__cb"])
                    & (stored_sh[id_col] == cand_old["old_id"]),
                    "left_semi",
                )
                .select(
                    F.col(id_col).alias("old_id"),
                    F.col("sh").alias("sh_old"),
                    F.col("__fp").alias("__fp_o"),
                    F.col("__n").alias("__n_o"),
                )
            )
            sh_old = sh_old.unionByName(stored_cand)

    # Set-fingerprint short-circuit for the verify: on crawl-style
    # corpora most LSH candidates are EXACT duplicates (the sf1 replica
    # set: ~90% of ~114k pairs/batch), and the O(|a|·|b|) per-pair
    # array_intersect is pure waste on them. Equal-fingerprint pairs
    # verify as Jaccard 1.0 inside a CASE WHEN whose intersect branch
    # never evaluates for them (CaseWhen evaluates branches lazily per
    # row; a SPLIT plan — fp-only pairs decided before any array join —
    # was A/B-measured SLOWER at sf1: the arrays never ballooned
    # through a shuffle, so the split only added join passes).
    # size > 0 guards the empty-set pairs that reach the verify through
    # shared NULL-filled bands — those must stay NULL-rejected (0/0),
    # not fp-matched. Accuracy: a false drop needs an xxhash64
    # collision on the sorted set (2⁻⁶⁴) — the same accepted class as
    # hashed_word_shingles.
    cands = (
        pair_ids.join(sh_new, "new_id")
        .join(sh_old, "old_id")
        .withColumn("__fp_eq", F.col("__fp_n") == F.col("__fp_o"))
    )
    # Sizes come from the precomputed __n columns (stored side: read
    # off the store; in-batch side: computed once at index time) — the
    # verify never re-measures fetched arrays (r14, ADVICE: __n was
    # written but unread).
    inter = F.size(F.array_intersect("sh_new", "sh_old")).cast("double")
    union = (F.col("__n_n") + F.col("__n_o")).cast("double") - inter
    # when(union > 0): two sub-shingle-length docs share their
    # NULL-filled minhash bands, so empty-set pairs DO reach this
    # verify — 0/0 must be NULL (pair rejected), not an ANSI
    # divide-by-zero that kills the foreachBatch (same guard as
    # operators/dedup.jaccard_verify).
    jaccard = F.when(
        F.col("__fp_eq") & (F.col("__n_n") > 0), F.lit(1.0)
    ).otherwise(F.when(union > 0, inter / union))
    return (
        cands.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
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
    are verified with exact Jaccard on the stored shingle sets,
    fetched by candidate id only (see ``_dropped_ids``).
    """
    from ..sources.tables import fan_out

    # fan_out BEFORE the index projection: a micro-batch often arrives
    # as one split (a single file, one kafka partition) while the
    # shingle+minhash projection is pure CPU — measured 4.9 s → 1.5 s
    # per 50k-doc batch at sf1 on local[32]. The store writes below
    # re-narrow so the fan-out never multiplies store file counts.
    idx_new = _index_batch(
        fan_out(batch), id_col, text_col, n_hashes, bands, shingle_size
    ).localCheckpoint(eager=True)

    dropped = (
        _dropped_ids(spark, idx_new, store_dir, id_col, threshold)
        # materialize BEFORE the store append below: the returned
        # ``kept`` frame must never observe this batch's own index
        # rows through a re-read of the store directories
        .localCheckpoint(eager=True)
    )
    kept = batch.join(dropped, id_col, "left_anti")

    # coalesce/repartition before the appends: the fan-out above is for
    # projection CPU, not for the store layout — without re-narrowing,
    # every batch would append parallelism-many band files and up to
    # parallelism × N_BUCKETS shingle files (tiny-file creep the next
    # batches re-read). Both inputs are checkpointed, so this costs a
    # batch-sized merge, not a recompute.
    idx_new.select(id_col, "band_idx", "band_hash").coalesce(4).write.mode(
        "append"
    ).parquet(os.path.join(store_dir, "bands"))
    (
        idx_new.filter(F.col("band_idx") == 0)
        .select(F.col(id_col), F.col("sh"))
        .withColumn("__fp", set_fingerprint("sh"))
        .withColumn("__n", F.size("sh"))
        .withColumn("__bucket", _bucket(F.col(id_col)))
        .repartition("__bucket")  # one file per bucket per batch
        .write.mode("append")
        .partitionBy("__bucket")
        .parquet(os.path.join(store_dir, "shingles"))
    )
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
