"""In-engine n-gram language-model scoring (U5 + "model in the
engine" family, alongside the logreg classifier and k-means): train an
add-alpha-smoothed bigram LM on the corpus's own token stream and
score every document by mean log-likelihood — the perplexity-proxy
quality signal CCNet-style pipelines use to rank crawl text against a
reference corpus (Wenzek et al. 2020 use a KenLM 5-gram; the bigram
form is the same statistic at the order the engine can train exactly
in two aggregates).

Scale design (100 TB):
- the MODEL is relations, not driver state: bigram counts
  (groupBy(prev, cur), map-side combinable) and context counts
  (groupBy(prev)) — vocabulary-bounded tables that join back onto the
  token stream on the same keys they were aggregated on;
- the vocabulary size (the smoothing denominator) is ONE scalar
  aggregate shipped as a broadcast 1-row frame — no driver collect in
  the plan;
- scoring is one equi-join per table plus a per-doc average: every
  shuffle is keyed on tokens or doc ids. No Python anywhere.

Cross-engine determinism: per-doc mean of ln() terms is an
order-dependent double sum, so the surfaced score is float32 (the repo
float policy for division/avg-derived values); rule thresholds over it
should use the f32 value on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_logprob_scores(
    df: DataFrame, id_col: str, text_col: str, k: float = 1.0
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    add-``k`` smoothed unigram LM (the order-1 sibling of
    :func:`bigram_lm_doc_scores` — same model-as-relations shape: one
    map-side-combinable vocab count, 1-row broadcast totals, a token
    join + per-doc agg). Output: (id, n_tok, mean_logprob float32)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).cast("double").alias("v")
    )
    lp = F.log((F.col("c") + F.lit(float(k))) / (F.col("n") + F.lit(float(k)) * F.col("v")))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), lp.alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.avg("lp").cast("float").alias("mean_logprob"),
    )


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur) — one row per positional token bigram. Tokens
    split on ``\\s+`` with empty tokens dropped (the repo-wide token
    convention); the bigram array builds row-locally (no posexplode
    self-join), let-bound so the split runs once per row."""
    from ..functions.text import _bind

    def grams(t):
        k = F.size(t)
        return F.when(
            k >= 2,
            F.transform(
                F.sequence(F.lit(2), F.greatest(k, F.lit(2))),
                lambda i: F.struct(
                    F.element_at(t, i - 1).alias("prev"),
                    F.element_at(t, i).alias("cur"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    pairs = _bind(toks, grams)
    return df.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur")
    )


def bigram_lm_doc_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Mean bigram log-likelihood per document under the corpus's own
    add-``alpha`` bigram LM:

        score(d) = mean over bigrams (p, c) of d of
                   ln( (count(p, c) + alpha) / (count(p, ·) + alpha·V) )

    where V is the corpus vocabulary size. Low scores mark documents
    whose token transitions are atypical for the corpus (gibberish,
    wrong-language, templated noise) — the standard LM-filter signal.

    Output: (id, n_bigrams, lm_score float32); documents with fewer
    than 2 tokens have no bigrams and score NULL (surfaced, not
    dropped — the caller decides what a scoreless doc means).
    """
    bg = doc_bigrams(df, id_col, text_col)
    big = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    # Context counts and vocabulary derive from the bigram TABLE, not
    # the instance stream: count(p, ·) = Σ_c count(p, c), and the token
    # set of the distinct pairs is the token set of the stream. The
    # naive form re-tokenized and re-exploded the whole corpus three
    # more times (once for ctx, twice for the vocab union) and shuffled
    # the full bigram stream for each; these aggregate the
    # vocabulary-bounded count table instead.
    ctx = big.groupBy("prev").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = (
        big.select(F.col("cur").alias("tok"))
        .unionByName(big.select(F.col("prev").alias("tok")))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bg.join(big, ["prev", "cur"])
        .join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.col("c_bg") + F.lit(alpha))
                / (F.col("c_ctx") + F.lit(alpha) * F.col("v"))
            ).alias("ll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("ll").cast("float").alias("lm_score"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score",
        )
    )
