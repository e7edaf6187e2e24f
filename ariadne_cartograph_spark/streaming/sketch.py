"""Streaming heavy hitters (T4/U3 + text-analysis north star): a
Misra-Gries frequent-items sketch maintained as Structured Streaming
arbitrary state, the online twin of ``operators/sketch.py``.

Topology: token stream → hash-bucket key → ``applyInPandasWithState``
holding one MG summary (capacity m) PER BUCKET. Buckets make the state
shard-parallel: each bucket sees only its own tokens, so its summary
obeys the per-bucket bound n_bucket/(m+1) and the union of bucket
candidates is a superset of every token with corpus frequency above
the bound — the same candidates-then-exact-recount contract as the
batch operator, with the sketch built incrementally as batches arrive.

Scale design: state per bucket is ≤ m (token, count) pairs — model-
sized, independent of stream length; each micro-batch shuffles only
(bucket-hashed) tokens of that batch; emissions are the touched
buckets' summaries (update mode), so the memory/table sink holds a
superset of the final candidate set, which is all the recount needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_SKETCH_STATE = StructType(
    [
        StructField("toks", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)
_SKETCH_OUT = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("tok", StringType()),
        StructField("mg_count", LongType()),
    ]
)


def stage_docs_as_stream_source(
    spark: SparkSession, sf_dir: str, stage_dir: str, n_files: int = 4
) -> str:
    """Materialize `documents` as an N-file parquet dir — a replayable
    file-stream source (one file ≙ one micro-batch)."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.repartitionByRange(n_files, "doc_id").write.mode("overwrite").parquet(
        stage_dir
    )
    return stage_dir


def read_docs_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def running_token_sketch(
    stream: DataFrame,
    text_col: str = "text",
    n_buckets: int = 16,
    capacity: int = 512,
) -> DataFrame:
    """Per-bucket MG summaries maintained across micro-batches. Emits
    each touched bucket's current summary every batch (update mode);
    the DISTINCT tok set over all emissions is a candidate superset."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    toks = stream.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)).cast("int"))

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        if state.exists:
            prev_toks, prev_counts = state.get
            counters = pd.Series(list(prev_counts), index=list(prev_toks), dtype="int64")
        else:
            counters = pd.Series(dtype="int64")
        for pdf in pdfs:
            vc = pdf["tok"].value_counts()
            if vc.empty:
                continue
            counters = counters.add(vc, fill_value=0)
            if len(counters) > capacity:
                thr = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters - thr
                counters = counters[counters > 0]
        counters = counters.astype("int64")
        state.update((list(counters.index), [int(c) for c in counters]))
        yield pd.DataFrame(
            {
                "bucket": key[0],
                "tok": counters.index.astype(str),
                "mg_count": counters.to_numpy(),
            }
        )

    return toks.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=_SKETCH_OUT,
        stateStructType=_SKETCH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
