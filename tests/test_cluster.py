"""Connected-components cluster resolution: ground truth via a plain
python union-find on the same pair list (independent oracle), plus
shape/convergence properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators import dedup as D
from ariadne_cartograph_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


PAIRS = [
    # chain 1-2-3-4 (diameter 3: exercises multiple propagation rounds)
    (1, 2), (2, 3), (3, 4),
    # triangle 10-11-12
    (10, 11), (11, 12), (10, 12),
    # isolated pair
    (20, 21),
    # star centered at 30
    (30, 31), (30, 32), (30, 33),
]


def test_connected_components_match_union_find(spark):
    pairs = spark.createDataFrame(PAIRS, ["id_a", "id_b"])
    got = {r.id: r.comp for r in connected_components(pairs).collect()}
    want = _union_find(PAIRS)
    # canonicalize union-find labels to component minima
    comp_min = {}
    for x, r in want.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[r] for x, r in want.items()}
    assert got == want
    D.release_caches()


def test_long_chain_converges(spark):
    n = 12  # diameter 12 > max_iter=4 — min-label needs a round per hop
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError):
        connected_components(pairs, max_iter=4).collect()
    got = {r.id: r.comp for r in connected_components(pairs, max_iter=n).collect()}
    assert got == {i: 0 for i in range(n + 1)}
    D.release_caches()


def test_dedup_clusters_keep_min_and_members(spark):
    pairs = spark.createDataFrame(PAIRS, ["id_a", "id_b"])
    rows = {r.keep_id: r for r in dedup_clusters(pairs).collect()}
    assert set(rows) == {1, 10, 20, 30}
    assert rows[1].n_members == 4 and rows[1].members == [1, 2, 3, 4]
    assert rows[10].members == [10, 11, 12]
    assert rows[20].members == [20, 21]
    assert rows[30].members == [30, 31, 32, 33]
    D.release_caches()


def test_cluster_resolution_consistent_with_pairs(spark):
    """Every near-dup pair's two docs land in the same cluster; every
    cluster member appears in ≥1 pair (singletons not emitted)."""
    sf = "/root/testdata/sf0.001"
    from ariadne_cartograph_spark.sources.tables import load_table

    docs = load_table(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs_auto(docs, "doc_id", "text", 3, 0.6)
    plist = [(r.id_a, r.id_b) for r in pairs.collect()]
    clusters = dedup_clusters(pairs).collect()
    label = {m: r.keep_id for r in clusters for m in r.members}
    for a, b in plist:
        assert label[a] == label[b]
    assert set(label) == {x for p in plist for x in p}
    D.release_caches()


def test_keep_best_per_cluster_argmax_and_tiebreak(spark):
    from ariadne_cartograph_spark.operators.cluster import keep_best_per_cluster

    pairs = spark.createDataFrame(PAIRS, ["id_a", "id_b"])
    # chain cluster {1,2,3,4}: unique max at 3; triangle {10,11,12}:
    # tie between 11 and 12 -> min id 11 wins; pair {20,21}: tie at
    # equal scores -> 20.
    scores = spark.createDataFrame(
        [(1, 5), (2, 7), (3, 9), (4, 7),
         (10, 1), (11, 8), (12, 8),
         (20, 4), (21, 4)],
        ["id", "score"],
    )
    out = {
        r["cluster_id"]: (r["keep_id"], r["keep_score"], r["n_members"], r["members"])
        for r in keep_best_per_cluster(pairs, scores).collect()
    }
    assert out == {
        1: (3, 9, 4, [1, 2, 3, 4]),
        10: (11, 8, 3, [10, 11, 12]),
        20: (20, 4, 2, [20, 21]),
    }


def test_keep_best_matches_python_oracle_random_graphs(spark):
    """Property vs a pure-python union-find + argmax oracle over a
    bank of seeded random graphs (one Spark job per graph is slow, so
    the graphs are unioned into one frame with a graph-id offset —
    partition-independence comes free from the offset disjointness)."""
    import random

    from ariadne_cartograph_spark.operators.cluster import keep_best_per_cluster

    all_pairs, all_scores, want = [], {}, {}
    for g in range(8):
        rng = random.Random(1000 + g)
        base = g * 10_000
        n = rng.randint(2, 30)
        ids = [base + i for i in range(n)]
        pairs = [
            (rng.choice(ids), rng.choice(ids)) for _ in range(rng.randint(1, 40))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            pairs = [(ids[0], ids[1])]
        scores = {i: rng.randint(0, 5) for i in ids}  # small range: many ties
        all_pairs += pairs
        all_scores.update(scores)
        # python oracle
        label = _union_find(pairs)
        comp_min = {}
        for x, r in label.items():
            comp_min[r] = min(comp_min.get(r, x), x)
        by_comp = {}
        for x, r in label.items():
            by_comp.setdefault(comp_min[r], []).append(x)
        for cid, members in by_comp.items():
            best = max(members, key=lambda i: (scores[i], -i))
            want[cid] = (best, scores[best], len(members), sorted(members))

    pairs_df = spark.createDataFrame(all_pairs, ["id_a", "id_b"])
    scores_df = spark.createDataFrame(list(all_scores.items()), ["id", "score"])
    got = {
        r["cluster_id"]: (r["keep_id"], r["keep_score"], r["n_members"], r["members"])
        for r in keep_best_per_cluster(pairs_df, scores_df).collect()
    }
    assert got == want
