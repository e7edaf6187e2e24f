"""Round-9 items: near-dup cache auto-release scope, and the bucketed
MERGE crossover guidance (r7 verdict polish, executed r9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators.dedup import (
    _LIVE_CACHES,
    cache_scope,
    minhash_near_dup_pairs,
    release_caches,
)
from ariadne_cartograph_spark.operators.merge import ParquetMergeTable


def _docs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog token "),
            (F.col("id") % 4).cast("string"),
        ).alias("body"),
    )


def test_cache_scope_releases_on_exit(spark):
    release_caches()
    assert not _LIVE_CACHES
    with cache_scope():
        pairs = minhash_near_dup_pairs(_docs(spark), id_col="doc_id", text_col="body")
        pairs.count()
        assert _LIVE_CACHES, "builder should have tracked persists"
    assert not _LIVE_CACHES, "scope exit must unpersist everything it tracked"


def test_cache_scope_releases_on_exception_and_nests(spark):
    release_caches()
    with cache_scope():
        minhash_near_dup_pairs(_docs(spark), id_col="doc_id", text_col="body").count()
        outer = len(_LIVE_CACHES)
        assert outer > 0
        with pytest.raises(RuntimeError):
            with cache_scope():
                minhash_near_dup_pairs(
                    _docs(spark, 24), id_col="doc_id", text_col="body"
                ).count()
                assert len(_LIVE_CACHES) > outer
                raise RuntimeError("boom")
        # inner scope cleaned up its own persists only
        assert len(_LIVE_CACHES) == outer
    assert not _LIVE_CACHES


def test_bucketed_merge_crossover_guidance(spark, tmp_path):
    """WHEN to bucket, pinned as rewrite-amplification counts (wall
    time is load-noise; files rewritten is the deterministic signal):

    - incremental batch (1 key of 200): bucketed rewrites exactly 1 of
      16 buckets; plain rewrites the whole table. Bucketing wins by
      ~n_buckets on I/O — the 100 TB shape.
    - full-table-touch batch (every key updated): bucketed rewrites
      ALL 16 buckets — same O(table) I/O as plain PLUS the 16-way
      partitionBy fan-out, so bucketing buys nothing and costs the
      fan-out (the ~2x wall-time observation recorded at the sf1
      rehearsal, note_r7b).

    Guidance: bucket when typical batches touch a small fraction of
    buckets; keep the plain layout for rebuild-everything pipelines.
    """
    plain = ParquetMergeTable(spark, str(tmp_path / "plain"), key="gid")
    buck = ParquetMergeTable(spark, str(tmp_path / "buck"), key="gid", n_buckets=16)
    seed = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "gid long, val double"
    )
    plain.upsert(seed)
    buck.upsert(seed)
    m0 = buck._read_manifest(buck._current()[1])
    assert set(m0["buckets"]) == {str(b) for b in range(16)}

    # incremental: 1 key → 1 bucket rewritten, 15 carried by reference
    inc = spark.createDataFrame([(0, -1.0)], "gid long, val double")
    plain.upsert(inc)
    buck.upsert(inc)
    m1 = buck._read_manifest(buck._current()[1])
    rewritten_inc = {b for b in m1["buckets"] if m1["buckets"][b] != m0["buckets"][b]}
    assert len(rewritten_inc) == 1

    # full-table-touch: every key updated → every bucket rewritten;
    # the pruning property degenerates and only the fan-out remains
    full = spark.createDataFrame(
        [(i, float(-i)) for i in range(200)], "gid long, val double"
    )
    plain.upsert(full)
    buck.upsert(full)
    m2 = buck._read_manifest(buck._current()[1])
    rewritten_full = {b for b in m2["buckets"] if m2["buckets"][b] != m1["buckets"][b]}
    assert rewritten_full == set(m1["buckets"]), (
        "a full-rewrite batch must touch every bucket — if this ever "
        "prunes, the guidance (and the 2x fan-out cost note) is stale"
    )
    # both layouts still agree on values
    p = {r.gid: r.val for r in plain.read().collect()}
    b = {r.gid: r.val for r in buck.read().collect()}
    assert p == b and p[7] == -7.0
