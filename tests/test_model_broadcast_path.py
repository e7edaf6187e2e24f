"""The broadcast-matrix model path (centroids/codebooks as ONE
broadcast row + higher-order transforms) must (a) produce bit-identical
results to the literal path — same cosine/L2 fold order — and (b) keep
the plan constant-size in the model, where the literal path grows
O(n_centroids × dim) expression nodes and stalls Catalyst at
production ANN scale (k=4096, dim=768). r4 VERDICT item 3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)
from ariadne_cartograph_spark.operators.similarity import (
    LITERAL_MODEL_MAX,
    _with_centroid_scores,
    ann_ivf_topk,
)

DIM = 64
N_CENT = 256  # 256 × 64 = 16384 floats > LITERAL_MODEL_MAX → auto-broadcast


@pytest.fixture(scope="module")
def corpus(spark):
    """300 deterministic pseudo-random vectors, dim=64 — column-math
    generated (no driver-side data)."""
    df = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(1000)).cast(
                        "double"
                    )
                    / 500.0
                    - 1.0
                )
                for d in range(DIM)
            ]
        ).alias("emb"),
    )
    df = df.localCheckpoint(eager=True)
    return df


def test_auto_threshold_picks_broadcast_above_max(corpus):
    assert N_CENT * DIM > LITERAL_MODEL_MAX
    # auto path on a big model must not inline literals: the analyzed
    # plan stays small and contains no float literals from the model
    cents = [[float(i + d) for d in range(DIM)] for i in range(N_CENT)]
    scored = _with_centroid_scores(corpus, "emb", cents)
    plan = scored._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 100_000, "model leaked into the plan as literals"


def test_centroid_scores_identical_across_paths(corpus):
    cents = [
        [float(x) for x in r["emb"]]
        for r in corpus.orderBy("vec_id").limit(N_CENT).collect()
    ]
    lit = _with_centroid_scores(corpus, "emb", cents, path="literal")
    bc = _with_centroid_scores(corpus, "emb", cents, path="broadcast")
    rows_l = {r["vec_id"]: r["__cs"] for r in lit.collect()}
    rows_b = {r["vec_id"]: r["__cs"] for r in bc.collect()}
    assert rows_l.keys() == rows_b.keys()
    for k in rows_l:
        assert rows_l[k] == rows_b[k], f"score drift for vec {k}"


@pytest.mark.slow
def test_ann_ivf_topk_identical_across_paths(corpus):
    queries = corpus.filter(F.col("vec_id") < 5)
    kw = dict(
        id_col="vec_id", vec_col="emb", k=5, n_centroids=N_CENT, n_probe=8,
        centroids="first",
    )
    got_l = sorted(
        map(tuple, ann_ivf_topk(corpus, queries, path="literal", **kw).collect())
    )
    got_b = sorted(
        map(tuple, ann_ivf_topk(corpus, queries, path="broadcast", **kw).collect())
    )
    assert got_l == got_b
    assert len(got_b) == 5 * 5


@pytest.mark.slow
def test_pq_encode_identical_across_paths(corpus):
    # m=4 subspaces × k=256 codewords × dsub=16 = 16384 floats
    books = pq_codebooks(corpus, "vec_id", "emb", m=4, k=256)
    enc_l = {
        r["vec_id"]: (r["pq_codes"], r["pq_err"])
        for r in pq_encode(corpus, "emb", books, path="literal").collect()
    }
    enc_b = {
        r["vec_id"]: (r["pq_codes"], r["pq_err"])
        for r in pq_encode(corpus, "emb", books, path="broadcast").collect()
    }
    assert enc_l == enc_b


def test_pq_adc_topk_identical_across_paths(corpus):
    books = pq_codebooks(corpus, "vec_id", "emb", m=4, k=256)
    codes = pq_encode(corpus, "emb", books, path="broadcast").select(
        "vec_id", "emb", "pq_codes"
    )
    queries = corpus.filter(F.col("vec_id") < 3)
    got_l = sorted(
        map(
            tuple,
            pq_adc_topk(codes, queries, "vec_id", "emb", books, k=5, path="literal")
            .collect(),
        )
    )
    got_b = sorted(
        map(
            tuple,
            pq_adc_topk(codes, queries, "vec_id", "emb", books, k=5, path="broadcast")
            .collect(),
        )
    )
    assert got_l == got_b
    assert len(got_b) == 3 * 5
