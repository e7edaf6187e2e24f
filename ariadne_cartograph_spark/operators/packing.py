"""Sequence packing — assign documents to fixed-length training
sequences (GPT-style "concatenate the corpus, cut every L tokens").

The reference repo has no training-data surface; this is part of the
north-star LLM-pipeline family (SURVEY.md §6): before a 100 TB corpus
is fed to a trainer, documents are concatenated in a deterministic
order and sliced into fixed context windows, and the pipeline must
know, per document, which pack it lands in and at what offset — e.g.
to build index files, to audit boundary-crossing docs, or to shard
packs across data-parallel ranks.

Plan shape / 100 TB posture
---------------------------
A single global concatenation order would force one total sort — a
single reducer at the tail.  Instead the corpus is hash-sharded
(`n_shards`, the parallelism knob: one shard ≈ one pack-writer task on
a real cluster) and each shard packs independently:

- shard assignment is pure column math (md5-prefix bucket, the same
  deterministic idiom as the corpus split operator);
- the running token offset is one window aggregate partitioned by
  shard — Spark sorts *within* each shard only (a per-shard external
  sort, exactly what a pack-writer does before emitting), never
  globally;
- everything downstream of the window (pack id, offset, boundary
  flag) is arithmetic on the running sum.

One shuffle (hash by shard), zero Python, zero driver collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# Pack ids are globally unique: shard * _PACK_SPACE + local pack index.
# 10^12 packs per shard is unreachable (a pack is >= 1 token).
_PACK_SPACE = 1_000_000_000_000


def shard_bucket(key: Column, n_shards: int) -> Column:
    """Deterministic cross-engine shard id in [0, n_shards) from the
    first 8 hex chars of md5(key) — identical to DuckDB's
    ``CAST('0x' || substring(md5(key), 1, 8) AS BIGINT) % n``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % n_shards
    )


def sequence_pack(
    docs: DataFrame,
    context_len: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Assign every document a (pack_id, offset_in_pack) under
    shard-local concatenate-and-cut packing.

    Within a shard, documents are concatenated in ascending `id_col`
    order and the stream is cut every `context_len` tokens; documents
    may span a cut (flagged `spans_boundary`), as in standard LM
    pre-training packing.

    Returns one row per input document:
    doc_id, shard, n_tokens, pack_id, offset_in_pack, spans_boundary.
    """
    if tokens_col is None:
        from ..functions.text import token_count

        tokens_col = token_count("text")
    sharded = docs.select(
        F.col(id_col).alias("doc_id"),
        shard_bucket(F.col(id_col), n_shards).alias("shard"),
        tokens_col.cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    packed = sharded.withColumn("cum_excl", cum)
    local_pack = F.expr(f"cum_excl div {context_len}")
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("shard") * _PACK_SPACE + local_pack).alias("pack_id"),
        (F.col("cum_excl") % context_len).alias("offset_in_pack"),
        ((F.col("cum_excl") % context_len) + F.col("n_tokens") > context_len)
        .alias("spans_boundary"),
    )
