"""Streaming/incremental PCA training (T6-style incremental twin of
operators/pca.py): the int64 Gram matrix is ASSOCIATIVE, so per-batch
Gram partials accumulated across an availableNow stream sum to exactly
the batch-mode Gram — the trained direction and every projection are
bit-identical to the offline train, which is what the parity catalog
entry (plans/text_queries.embedding_stream_pca_parity) pins against the
same DuckDB oracle as the batch entry.

This is the standard production shape for model-state maintenance over
an append-only embedding store: each micro-batch contributes a d²
integer increment (model-sized — the driver state is 64×64 longs, never
O(rows)), and retraining after any number of batches is a driver-side
O(iters·d²) pass with no replay of historical data.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..operators.pca import Q_SCALE, gram_matrix, quantize_vec
from ..sources.tables import load_table


def stage_embeddings_as_stream_source(
    spark: SparkSession, sf_dir: str, stage_dir: str, n_files: int = 4
) -> None:
    """Rewrite the embeddings table as n_files parquet files so a
    file-source stream replays it as (at least) n_files micro-batches
    with maxFilesPerTrigger=1."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb.repartition(n_files).write.mode("overwrite").parquet(stage_dir)


def streaming_gram(
    spark: SparkSession, stage_dir: str, q_scale: int = Q_SCALE
) -> list[list[int]]:
    """Accumulate the exact integer Gram across an availableNow file
    stream (one file per micro-batch). Python-int accumulation on the
    driver: unbounded precision, and each per-batch partial is already
    an exact int64 Spark aggregate."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(stage_dir).schema
    acc: list[list[int]] = []

    def _process(batch: DataFrame, batch_id: int) -> None:
        qdf = batch.select(quantize_vec(F.col("embedding"), q_scale).alias("q"))
        G = gram_matrix(qdf, "q")
        if not G:
            return
        if not acc:
            acc.extend([row[:] for row in G])
        else:
            for i in range(len(G)):
                for j in range(len(G)):
                    acc[i][j] += G[i][j]

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    ckpt = tempfile.mkdtemp(prefix="acs_pca_ckpt_")
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", os.path.join(ckpt, "gram"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return acc


def streaming_gram_durable(
    spark: SparkSession,
    stage_dir: str,
    gram_dir: str,
    checkpoint_dir: str,
    q_scale: int = Q_SCALE,
    fail_at_batch: int | None = None,
) -> None:
    """Crash-tolerant streaming Gram maintenance (r12 verdict task #7 —
    the in-memory accumulator above proves associativity under CLEAN
    replay; this is the restartable production shape).

    Each micro-batch's exact d² int64 partial lands in
    ``gram_dir/batch_id=N`` with per-batch-directory OVERWRITE, keyed
    by the Structured Streaming batch id. foreachBatch is
    at-least-once: after a crash, the restarted query replays the
    uncommitted batch with the SAME id over the SAME file-source offset
    range, so the overwrite makes accumulation exactly-once — a
    partial written just before the crash is replaced, never
    double-counted. :func:`read_gram_store` folds the store in
    unbounded Python ints; equality with the offline
    :func:`operators.pca.gram_matrix` is test-pinned under an injected
    mid-stream crash (tests/test_pca.py).

    ``fail_at_batch``: test hook — raise AFTER writing that batch's
    partial (the hard case: state persisted, commit lost)."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(stage_dir).schema

    def _process(batch: DataFrame, batch_id: int) -> None:
        qdf = batch.select(quantize_vec(F.col("embedding"), q_scale).alias("q"))
        G = gram_matrix(qdf, "q")
        if G:
            d = len(G)
            rows = [(i + 1, j + 1, G[i][j]) for i in range(d) for j in range(d)]
            (
                spark.createDataFrame(rows, "i int, j int, s long")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(gram_dir, f"batch_id={batch_id}"))
            )
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(f"injected crash after batch {batch_id}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_gram_store(spark: SparkSession, gram_dir: str) -> list[list[int]]:
    """Fold the per-batch partial store into the total Gram. The
    cross-batch sum runs in unbounded Python ints (each batch partial
    is an exact, envelope-asserted int64 aggregate; their SUM may not
    fit int64, so no Spark-side aggregation here — the store is
    model-sized, #batches·d² rows), then the int64 envelope is
    re-asserted on the total for oracle replayability."""
    rows = spark.read.parquet(gram_dir).collect()
    if not rows:
        return []
    agg: dict[tuple[int, int], int] = {}
    for r in rows:
        k = (r["i"], r["j"])
        agg[k] = agg.get(k, 0) + int(r["s"])
    d = max(i for i, _ in agg)
    G = [[0] * d for _ in range(d)]
    for (i, j), s in agg.items():
        assert abs(s) < 2**63, "int64 Gram envelope exceeded — lower q_scale"
        G[i - 1][j - 1] = s
    return G
