"""Ranked text retrieval over the documents table: TF-IDF / BM25
scoring as pure DataFrame algebra — the "find documents like this /
matching this query" primitive a training-data curation pipeline runs
at corpus scale (e.g. decontamination sweeps: score the corpus against
benchmark queries and drop high-scoring hits).

Scale design (100 TB):
- one tokenize pass feeds term-frequency, doc-length and doc-frequency
  aggregates — all map-side-combinable groupBys keyed on (doc, term)
  or term, never a window over the corpus;
- corpus statistics (N, avgdl) are 1-row aggregates attached by
  crossJoin(broadcast(...)), the same pattern as the enrichment
  normalizer (A2/A3);
- the query term list is a broadcast semi-join filter, so the per-query
  cost is proportional to the posting lists touched, not the corpus;
- top-k uses orderBy+limit, which Spark executes as
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
  no global sort).

No reference-repo counterpart (the reference's query surface is
PostGIS SQL, /root/reference/README.md:29-38); part of the contract's
LLM-data-pipeline text-analysis surface (SURVEY.md §2 U5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOKEN_SPLIT = r"\s+"


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), TOKEN_SPLIT)).alias("tok")
    ).filter(F.col("tok") != "")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Sparck Jones, the Okapi
    formulation with the non-negative idf variant
    ln(1 + (N - df + 0.5)/(df + 0.5))):

        score(d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Returns (id, score float, rank) — score is cast to float32 so the
    ranking is stable across engines regardless of last-ulp libm
    differences. Deterministic: ties broken by id.
    """
    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    # NOTE (r14 optimization round): deriving dl/df from the tf table
    # (the text_bigram_lm_quality rewrite) was measured SLOWER here —
    # the query-term filter pushes through every term-keyed aggregate
    # below, so this formulation never shuffles an unfiltered (id, tok)
    # stream, while dl-from-tf forces the full tf exchange just to sum
    # doc lengths. Keep the branches independent: dl's per-doc count
    # partial-aggregates to one row per (partition, doc) before its
    # exchange. (Paired sf1 A/B: 2.84s this form vs 3.88s derived.)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_df = toks.select(id_col, "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = F.array(*[F.lit(t) for t in query_terms])
    scored = (
        tf.filter(F.array_contains(qterms, F.col("tok")))
        .join(F.broadcast(n_df.filter(F.array_contains(qterms, F.col("tok")))), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("term_score").cast("float").alias("score")
    )
    # limit(k) executes as TakeOrderedAndProject; the rank window then
    # runs over k rows only (single tiny partition — bounded by k).
    return (
        agg.orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("score"), F.col(id_col)))
        )
    )


def tfidf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse TF-IDF representation: one row per (id, term) with
    tf_idf = (tf / dl) · ln(N / df). The sparse long format IS the
    scale format — a dense vocabulary-wide vector per doc would be
    quadratic in vocabulary; downstream cosine/knn rides a term-keyed
    self-join over this frame."""
    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    # Independent dl/df branches, NOT derived from tf: consumers filter
    # by probe terms, and that filter pushes through the term-keyed
    # aggregates here but cannot rescue a dl-from-tf full exchange
    # (measured 2.88 → 4.67 s WORSE on text_tfidf_probe_terms at sf1 —
    # see the note in bm25_topk).
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_df = toks.select(id_col, "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        tf.join(dl, id_col)
        .join(n_df, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("tok").alias("term"),
            (
                (F.col("tf") / F.col("dl"))
                * F.log(F.col("n_docs") / F.col("df_t"))
            ).alias("tf_idf"),
        )
    )


def bm25_topk_per_term(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-term BM25 top-k: one ranking per query term, sharing ONE
    tokenize/tf/dl/df pass across all terms (calling :func:`bm25_topk`
    once per term re-runs the whole token pipeline |terms| times —
    measured 4× the cost on a 4-term eval).

    Output: (term, id, score float32, rank 1..k), ranks per term with
    the same (score DESC, id) tie-break as :func:`bm25_topk`. The
    scored frame (docs containing ≥1 query term — posting-list sized,
    not corpus sized) is persisted and each term's top-k runs as an
    independent orderBy+limit = TakeOrderedAndProject job over it: no
    window partitioned by term (one reducer per term — the skew
    killer when a term matches 1e8 docs), no recompute.
    """
    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    # Independent dl/df branches, NOT derived from tf — the query-term
    # filter pushes through the term-keyed aggregates (see the measured
    # note in bm25_topk).
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_df = toks.select(id_col, "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = F.array(*[F.lit(t) for t in query_terms])
    scored = (
        tf.filter(F.array_contains(qterms, F.col("tok")))
        .join(
            F.broadcast(n_df.filter(F.array_contains(qterms, F.col("tok")))), "tok"
        )
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
            ),
        )
        .select(
            F.col("tok").alias("term"),
            F.col(id_col),
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            )
            .cast("float")
            .alias("score"),
        )
        .persist()
    )
    try:
        outs = []
        for t in query_terms:
            top_t = (
                scored.filter(F.col("term") == t)
                .orderBy(F.desc("score"), F.col(id_col))
                .limit(k)
                .withColumn(
                    "rank",
                    F.row_number()
                    .over(Window.orderBy(F.desc("score"), F.col(id_col)))
                    .cast("long"),
                )
            )
            outs.append(top_t)
        out = outs[0]
        for t_df in outs[1:]:
            out = out.unionByName(t_df)
        # materialize before unpersisting the shared scored frame
        return out.localCheckpoint(eager=True)
    finally:
        scored.unpersist()
