"""remove_repeated_spans — cross-document repeated-span removal
(the rewrite half of exact-substring dedup, Lee et al. 2022).

Pins the operator against an independent pure-Python reference model
(string grams, interval coverage — a different formulation from the
operator's hash + ROWS-window-max plan) on adversarial corpora, plus
edge cases: short docs, fully-duplicated docs (empty cleaned text),
overlapping spans, and partition-count independence.
"""

from __future__ import annotations

import hashlib

import pytest

from ariadne_cartograph_spark.operators.dedup import remove_repeated_spans


def _py_reference(docs: dict[int, str], k: int, min_docs: int = 2):
    """Independent model: gram strings -> repeated set -> interval
    coverage -> cleaned text."""
    import re

    toks = {i: re.split(r"\s+", t) for i, t in docs.items()}
    owners: dict[str, set[int]] = {}
    for i, ts in toks.items():
        for s in range(len(ts) - k + 1):
            owners.setdefault(" ".join(ts[s : s + k]), set()).add(i)
    rep = {g for g, o in owners.items() if len(o) >= min_docs}
    out = {}
    for i, ts in toks.items():
        covered = [False] * len(ts)
        for s in range(len(ts) - k + 1):
            if " ".join(ts[s : s + k]) in rep:
                for j in range(s, s + k):
                    covered[j] = True
        clean = " ".join(t for t, c in zip(ts, covered) if not c)
        out[i] = (
            len(ts),
            sum(covered),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


def _run(spark, docs: dict[int, str], k: int = 4):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = remove_repeated_spans(df, "doc_id", "text", k=k).collect()
    return {r["doc_id"]: (r["n_tok"], r["n_removed"], r["clean_md5"]) for r in rows}


def test_matches_reference_on_shared_span(spark):
    shared = "alpha beta gamma delta epsilon"  # 5 tokens, k=4 -> 2 windows
    docs = {
        1: f"intro one two {shared} outro here",
        2: f"{shared} completely different tail text",
        3: "no duplication in this document at all",
    }
    assert _run(spark, docs, k=4) == _py_reference(docs, k=4)


def test_fully_duplicated_doc_empties(spark):
    same = "a b c d e f g h"
    docs = {1: same, 2: same}
    got = _run(spark, docs, k=4)
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert got[1] == (8, 8, empty_md5)
    assert got[2] == (8, 8, empty_md5)


def test_short_docs_untouched(spark):
    docs = {1: "one two three", 2: "one two three"}  # < k tokens
    got = _run(spark, docs, k=4)
    ref = _py_reference(docs, k=4)
    assert got == ref
    assert got[1][1] == 0  # nothing removed


def test_overlapping_and_adjacent_spans(spark):
    # doc 1 shares two OVERLAPPING spans with different partners
    docs = {
        1: "p q r s t u v w x y z",
        2: "header p q r s t footer words here",
        3: "start t u v w x other stuff too",
    }
    assert _run(spark, docs, k=4) == _py_reference(docs, k=4)


def test_min_docs_threshold(spark):
    tri = "m n o p"
    docs = {1: f"{tri} aa", 2: f"{tri} bb", 3: f"{tri} cc"}
    got3 = _run_min(spark, docs, k=4, min_docs=3)
    ref3 = _py_reference(docs, k=4, min_docs=3)
    assert got3 == ref3
    assert all(v[1] > 0 for v in got3.values())


def _run_min(spark, docs, k, min_docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = remove_repeated_spans(df, "doc_id", "text", k=k, min_docs=min_docs).collect()
    return {r["doc_id"]: (r["n_tok"], r["n_removed"], r["clean_md5"]) for r in rows}


def test_partition_independence(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(10))
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 25)))
        + (f" {shared} " + " ".join(rng.choice(vocab) for _ in range(5)) if i % 3 == 0 else "")
        for i in range(1, 40)
    }
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "doc_id long, text string"
        ).repartition(parts)
        rows = remove_repeated_spans(df, "doc_id", "text", k=4).collect()
        got = {r["doc_id"]: (r["n_tok"], r["n_removed"], r["clean_md5"]) for r in rows}
        if base is None:
            base = got
        else:
            assert got == base
    assert base == _py_reference(docs, k=4)


def test_collapse_route_equals_naive(spark, monkeypatch):
    # r12 verdict task #3: the gated exact-dup doc collapse must be
    # row-identical to the naive plan. Corpus mixes k-fold duplicated
    # docs (some fully covered, some partially), unique docs sharing a
    # span with a dup cluster, and sub-k shorts — the regimes where a
    # mis-weighted gram doc-count would flip a min_docs decision.
    import ariadne_cartograph_spark.operators.dedup as D

    shared = "s1 s2 s3 s4 s5"
    rows = []
    for c in range(6):  # 6 clusters of 3 identical docs
        rows += [(c * 10 + j, f"cluster {c} body x{c} y{c} {shared} tail{c}") for j in range(3)]
    rows += [(100, f"unique doc sharing {shared} only once here")]
    rows += [(101, "completely unique text with no repeats at all")]
    rows += [(102, "tiny"), (103, "tiny")]  # sub-k duplicated shorts
    df = spark.createDataFrame(rows, "doc_id long, text string")

    collapsed_df = remove_repeated_spans(df, "doc_id", "text", k=4)
    # genuine-route check (the r11 vacuous-test lesson): the collapsed
    # plan re-expands through the __rep member join; naive must not.
    assert "__rep" in collapsed_df._jdf.queryExecution().optimizedPlan().toString()
    collapsed = {r["doc_id"]: (r["n_tok"], r["n_removed"], r["clean_md5"])
                 for r in collapsed_df.collect()}

    monkeypatch.setattr(D, "_COLLAPSE_MIN_DUP_RATIO", 1.0)  # force naive
    naive_df = remove_repeated_spans(df, "doc_id", "text", k=4)
    assert "__rep" not in naive_df._jdf.queryExecution().optimizedPlan().toString()
    naive = {r["doc_id"]: (r["n_tok"], r["n_removed"], r["clean_md5"])
             for r in naive_df.collect()}
    D.release_caches()

    assert collapsed == naive
    docs = {i: t for i, t in rows}
    assert collapsed == _py_reference(docs, k=4)
    assert any(v[1] > 0 for v in collapsed.values())


def test_collapse_weighted_min_docs_single_cluster(spark, monkeypatch):
    # one text duplicated twice and NOTHING else repeated: the gram's
    # doc-count comes entirely from one cluster's cardinality (nd = 2
    # via the __cnt weight, not via two distinct reps) — the case a
    # collapse that forgot to weight reps would get wrong.
    import ariadne_cartograph_spark.operators.dedup as D

    same = "a b c d e f"
    docs = {1: same, 2: same, 3: "other words entirely different here now"}
    got = _run(spark, docs, k=4)
    D.release_caches()
    assert got == _py_reference(docs, k=4)
    assert got[1][1] == 6  # fully covered despite a single distinct rep


from hypothesis import given, settings, strategies as st


@st.composite
def _span_corpus(draw):
    # small vocab + short docs + k=3: maximizes cross-doc window
    # collisions, boundary windows (n == k, n == k-1), and overlapping
    # coverage intervals — the regimes where an off-by-one in the
    # start-expansion or the n<k guard would corrupt the rewrite
    vocab = ["a", "b", "c"]
    n_docs = draw(st.integers(2, 8))
    docs = {}
    for i in range(1, n_docs + 1):
        n_tok = draw(st.integers(1, 12))
        docs[i] = " ".join(
            draw(st.sampled_from(vocab)) for _ in range(n_tok)
        )
    return docs


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(_span_corpus())
def test_hypothesis_matches_reference(spark_session_for_hypothesis, docs):
    spark = spark_session_for_hypothesis
    assert _run(spark, docs, k=3) == _py_reference(docs, k=3)
