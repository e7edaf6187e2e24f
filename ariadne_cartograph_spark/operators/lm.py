"""Self-trained n-gram language-model scoring (U5 quality family).

Perplexity-proxy quality signal (public heuristic — the KenLM-style
"score documents by LM log-prob" filter used in CCNet-style curation
pipelines, here with the corpus's OWN add-k-smoothed unigram
distribution so no external model is needed): documents whose tokens
are improbable under the corpus distribution (gibberish, boilerplate
symbol soup, wrong-language fragments) score low and can be
threshold-filtered.

Scale design (100 TB):
- the unigram table is ONE map-side-combinable groupBy over exploded
  tokens (partial counts combine before the shuffle);
- corpus totals (N, |V|) are a 1-row aggregate — model statistics;
- scoring is a token → count join (broadcast when the vocab fits, a
  plain hash join on the token key otherwise — Zipf makes the vocab
  orders of magnitude smaller than the corpus) plus a per-doc agg;
- the per-doc mean is cast to float32: the sum of per-token logs is
  order-sensitive in the last double ulps across engines/partitions,
  and f32 is exactly the policy the repo uses for division-derived
  aggregates (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_logprob_scores(
    df: DataFrame, id_col: str, text_col: str, k: float = 1.0
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    add-``k`` smoothed unigram LM. Output: (id, n_tok, mean_logprob)."""
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
