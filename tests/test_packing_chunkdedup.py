"""Semantic pins for sequence packing and chunk-level (CCNet-style)
exact dedup — the cross-engine hash parity lives in
tests/test_oracle_parity.py; these pin the *behavioral* contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators.dedup import chunk_exact_dedup
from ariadne_cartograph_spark.operators.packing import sequence_pack


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_dedup_removes_boilerplate_keeps_unique(spark):
    boiler = " ".join(f"b{i}" for i in range(4))
    uniq = {d: " ".join(f"u{d}_{i}" for i in range(4)) for d in range(3)}
    # every doc = its unique chunk + the shared boilerplate chunk
    docs = _docs(
        spark, [(d, uniq[d] + " " + boiler) for d in range(3)]
    )
    out = {
        r["doc_id"]: r
        for r in chunk_exact_dedup(docs, "text", "doc_id", chunk_size=4).collect()
    }
    # doc 0 holds the first occurrence of the boilerplate: keeps both chunks
    assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["new_text"] == uniq[0] + " " + boiler
    # later docs lose the boilerplate chunk but keep their unique chunk
    for d in (1, 2):
        assert out[d]["n_kept"] == 1
        assert out[d]["new_text"] == uniq[d]


def test_chunk_dedup_exact_duplicate_doc_fully_removed(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = _docs(spark, [(1, text), (2, text)])
    out = {
        r["doc_id"]: r
        for r in chunk_exact_dedup(docs, "text", "doc_id", chunk_size=4).collect()
    }
    assert out[1]["n_kept"] == out[1]["n_chunks"] == 3
    assert out[2]["n_kept"] == 0 and out[2]["new_text"] == ""


@pytest.mark.slow
def test_chunk_dedup_partition_independent(spark):
    rows = [(d, " ".join(f"w{(d * 7 + i) % 23}" for i in range(17))) for d in range(40)]
    one = chunk_exact_dedup(
        _docs(spark, rows).coalesce(1), "text", "doc_id", chunk_size=5
    )
    many = chunk_exact_dedup(
        _docs(spark, rows).repartition(7), "text", "doc_id", chunk_size=5
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_sequence_pack_offsets_are_contiguous_per_shard(spark):
    docs = _docs(
        spark, [(d, " ".join("w" for _ in range(3 + d % 11))) for d in range(200)]
    )
    rows = sequence_pack(docs, context_len=16, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for shard, rs in by_shard.items():
        cum = 0
        for r in rs:
            # absolute stream position == local_pack * L + offset
            local_pack = r["pack_id"] - shard * 1_000_000_000_000
            assert local_pack * 16 + r["offset_in_pack"] == cum
            assert r["spans_boundary"] == (r["offset_in_pack"] + r["n_tokens"] > 16)
            cum += r["n_tokens"]


def test_sequence_pack_single_window_shuffle(spark):
    docs = _docs(spark, [(d, "a b c") for d in range(10)])
    plan = (
        sequence_pack(docs, context_len=8, n_shards=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hash-partitioning exchange (by shard) feeding the window; no
    # global single-partition sort
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
