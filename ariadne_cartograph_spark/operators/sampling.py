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
