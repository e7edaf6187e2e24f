"""Corpus sampling operators (U5/W1 family): deterministic, oracle-
checkable resampling primitives for training-data preparation.

Temperature-scaled domain mixture (public scheme — the exponential-
smoothing sampler used for multilingual/multi-domain pretraining
corpora, e.g. the α-smoothing of XLM/mT5): domain shares p_s are
flattened to q_s ∝ p_s^α (α<1 upweights rare domains), and the corpus
is resampled to a token/doc budget at the new mixture.

Scale design (100 TB):
- the mixture model is one tiny aggregate (one row per domain) —
  collected and broadcast like any model statistic;
- per-domain selection is a window PARTITIONED by domain ordered by
  md5(id) — a reproducible pseudo-random draw with no single-partition
  global window and no RNG state;
- a domain whose quota exceeds its size keeps everything (sampling
  without replacement; upsampling repeats belong to the training
  loader, not the corpus store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def domain_mixture_quotas(
    df: DataFrame, domain_col: str, alpha: float, budget: int
) -> DataFrame:
    """Per-domain keep-quotas for a temperature-α resample to ``budget``
    docs: quota_s = round(budget · n_s^α / Σ_t n_t^α), capped at n_s.
    Returns one row per domain — model-sized."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total_w = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("__tw")
    )
    return (
        counts.crossJoin(F.broadcast(total_w))
        .withColumn(
            "quota",
            F.least(
                F.col("n_docs"),
                F.round(
                    F.lit(float(budget))
                    * F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                    / F.col("__tw")
                ).cast("long"),
            ),
        )
        .drop("__tw")
    )


def importance_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    budget: int = 200,
) -> DataFrame:
    """DSIR-style importance resampling (public scheme — Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how much more likely its
    tokens are under a TARGET distribution (here the corpus subset
    matching ``target_pred``) than under the SOURCE distribution (the
    whole corpus), then draw ``budget`` docs ∝ weight via the Gumbel
    top-k trick.

    - log-weight = per-doc MEAN token log(P_tgt/P_src), add-1 smoothed
      with the shared source vocabulary size (length-normalized so long
      docs aren't favored);
    - the Gumbel noise is derived from md5(doc_id) — seedless,
      reproducible, replayable by any engine (same device as the other
      sampling ops here);
    - the selection key is rounded to 1e-4 before ranking so the
      cross-engine double-ulp noise in the token-log mean cannot flip
      an ordering (ties break by id).

    Scale design (100 TB): both unigram tables are map-side-combinable
    token aggregates (Zipf keeps them vocabulary-sized); scoring is a
    token→count join + per-doc agg; selection is one global top-k
    (TakeOrdered, no full sort).

    Output: (rank, id, log_ratio f32) — the ``budget`` selected docs.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    )
    tgt_toks = df.filter(target_pred).select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    )
    src = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("sc"))
    tgt = tgt_toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("tc"))
    stats = (
        src.agg(
            F.sum("sc").alias("ns"), F.count(F.lit(1)).cast("double").alias("v")
        )
        .crossJoin(F.broadcast(tgt.agg(F.sum("tc").alias("nt"))))
    )
    lr = F.log(
        (F.coalesce(F.col("tc"), F.lit(0.0)) + F.lit(1.0)) / (F.col("nt") + F.col("v"))
    ) - F.log((F.col("sc") + F.lit(1.0)) / (F.col("ns") + F.col("v")))
    scored = (
        toks.join(src, "tok")
        .join(tgt, "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), lr.alias("lr"))
        .groupBy(id_col)
        .agg(F.avg("lr").alias("log_ratio"))
    )
    # Seedless Gumbel(0,1) from md5(id): u in (0,1) strictly (the +0.5
    # offset keeps both log() calls off their singularities).
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    gkey = F.round(F.col("log_ratio") - F.log(-F.log(u)), 4)
    picked = (
        scored.withColumn("gkey", gkey)
        .orderBy(F.desc("gkey"), F.asc(id_col))
        .limit(budget)
    )
    # Ranking the post-limit frame is a 1-partition window over only
    # ``budget`` rows — the global TakeOrdered above did the real work.
    rank_w = W.orderBy(F.desc("gkey"), F.asc(id_col))
    return picked.select(
        F.row_number().over(rank_w).cast("long").alias("rank"),
        F.col(id_col),
        F.col("log_ratio").cast("float").alias("log_ratio"),
    )


def domain_mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    alpha: float = 0.5,
    budget: int = 1000,
) -> DataFrame:
    """Resample ``df`` to ≈``budget`` rows at the α-flattened domain
    mixture. Deterministic: within each domain the kept rows are the
    quota-many smallest by (md5(id), id) — a seedless reproducible draw
    that any engine can replay. Output: input rows + ``sample_rank``.
    """
    quotas = domain_mixture_quotas(df, domain_col, alpha, budget)
    w = W.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
    return ranked.join(
        F.broadcast(quotas.select(domain_col, "quota")), domain_col
    ).filter(F.col("sample_rank") <= F.col("quota")).drop("quota")
