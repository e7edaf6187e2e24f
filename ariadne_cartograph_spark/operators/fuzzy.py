"""Edit-distance (fuzzy) self-join — the string-similarity join family
member the dedup/similarity operators don't cover: pairs within a
bounded Levenshtein distance.

Public scheme: PassJoin (Li, Deng, Feng, "PASS-JOIN: A Partition-based
Method for Similarity Joins", PVLDB 2011) — partition each string into
d+1 contiguous segments; by pigeonhole, any string within edit distance
d contains at least one segment as an EXACT substring, at a start
position shifted by at most d. Candidate generation is therefore an
equi-join (segment = substring), never a cross product.

Scale design:
- the join runs over DISTINCT strings (one groupBy collapses the
  table; real corpora have heavy string duplication), and pair counts
  /checksums re-expand ALGEBRAICALLY from per-string (count, key-sum)
  aggregates — no key-pair materialization, output is O(#distinct²
  bounded by the verify) while the reported counts cover all rows;
- segment and substring enumeration are row-local array explodes
  (≤ (d+1) segments, O(|s|·d) probe substrings per string);
- the equi-join key is the segment text: skew follows segment
  frequency; candidates are distinct-ed before the levenshtein verify
  so a hot segment costs shuffle volume, not verify work;
- the verify is JVM codegen (`levenshtein`), no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(s, n, d: int):
    """d+1 deterministic contiguous segments of s (1-based substring):
    segment i covers [floor(i·n/(d+1)), floor((i+1)·n/(d+1)))."""
    parts = []
    for i in range(d + 1):
        start0 = F.floor(F.lit(i) * n / (d + 1)).cast("int")
        end0 = F.floor(F.lit(i + 1) * n / (d + 1)).cast("int")
        parts.append(
            F.struct(
                F.substring(s, start0 + 1, end0 - start0).alias("seg"),
                (start0 + 1).alias("pos"),
            )
        )
    return F.array(*parts)


def fuzzy_pair_stats(
    df: DataFrame, id_col: str, str_col: str, d: int = 2
) -> DataFrame:
    """All unordered row pairs with levenshtein(str_a, str_b) ≤ d,
    aggregated per distance: (dist, n_pairs, key_checksum) where
    key_checksum = Σ (id_a + id_b) over the pairs. Distance-0 pairs
    (identical strings) are computed purely from group aggregates.

    Completeness: pairs with at least one string LONGER than d chars
    ride the pigeonhole segment join (the long side's d+1 segments are
    all non-empty, so the unhit-segment witness is enumerable); pairs
    where BOTH strings have length ≤ d ride a direct pair join over
    the short-string universe — when every non-empty segment of a
    short string is edited, the witness segment is EMPTY and the probe
    side (substring lengths ≥ 1) can never produce it. That regime is
    confined to both-short pairs: editing all len(r) chars costs
    len(r), leaving ≤ d − len(r) insertions, so the partner's length
    is also ≤ d. The short universe is |Σ|^d-bounded distinct strings
    (model-sized for bounded d), broadcast on one side."""
    names = df.groupBy(F.col(str_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(id_col)).alias("sumk"),
    )
    n = F.length("s")
    segs = names.select(
        "s", F.explode(_segments(F.col("s"), n, d)).alias("g")
    ).select("s", F.col("g.seg").alias("seg"), F.col("g.pos").alias("pos"))
    # probe side: all substrings whose length can be a partner's segment
    # length (partner length within ±d ⇒ ℓ ∈ [⌊(m−d)/(d+1)⌋, ⌈(m+d)/(d+1)⌉])
    m = F.length("s")
    lo = F.greatest(F.floor((m - d) / (d + 1)).cast("int"), F.lit(1))
    hi = F.least(F.floor((m + d + d) / (d + 1)).cast("int"), m.cast("int"))
    # (length ≥ 1 guard: for the empty string, Spark's sequence(1, 0)
    # is DESCENDING [1, 0] and would enumerate bogus empty substrings;
    # length-0 strings can only pair within the both-short regime
    # handled below, so they need no probe substrings at all)
    subs = (
        names.filter(F.length("s") >= 1).select(
            "s",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(lo, hi),
                        lambda L: F.transform(
                            F.sequence(F.lit(1), m.cast("int") - L + 1),
                            lambda p: F.struct(
                                F.substring(F.col("s"), p, L).alias("seg"),
                                p.alias("pos"),
                            ),
                        ),
                    )
                )
            ).alias("g"),
        )
        .select(F.col("s").alias("t"), F.col("g.seg").alias("seg"), F.col("g.pos").alias("tpos"))
    )
    seg_cand = (
        segs.join(subs, "seg")
        .filter(
            (F.col("s") != F.col("t"))
            & (F.abs(F.length("s") - F.length("t")) <= d)
            & (F.abs(F.col("pos") - F.col("tpos")) <= d)
        )
        .select(
            F.least("s", "t").alias("x"), F.greatest("s", "t").alias("y")
        )
    )
    # both-short regime (see docstring): direct pair enumeration over
    # the distinct strings of length ≤ d — broadcast nested-loop over a
    # model-sized set, never a data-scale cross product.
    shorts = names.select("s").filter(F.length("s") <= d)
    short_cand = shorts.join(
        F.broadcast(shorts.select(F.col("s").alias("t"))),
        F.col("s") < F.col("t"),
    ).select(F.col("s").alias("x"), F.col("t").alias("y"))
    cand = seg_cand.unionByName(short_cand).distinct()
    verified = cand.select(
        "x", "y", F.levenshtein("x", "y").alias("dist")
    ).filter(F.col("dist") <= d)
    nx = names.select(
        F.col("s").alias("x"), F.col("cnt").alias("cx"), F.col("sumk").alias("kx")
    )
    ny = names.select(
        F.col("s").alias("y"), F.col("cnt").alias("cy"), F.col("sumk").alias("ky")
    )
    cross = (
        verified.join(nx, "x")
        .join(ny, "y")
        .select(
            "dist",
            (F.col("cx") * F.col("cy")).alias("n_pairs"),
            (F.col("cx") * F.col("ky") + F.col("cy") * F.col("kx")).alias(
                "key_checksum"
            ),
        )
    )
    same = names.filter(F.col("cnt") >= 2).select(
        F.lit(0).alias("dist"),
        F.expr("cnt * (cnt - 1) DIV 2").cast("bigint").alias("n_pairs"),
        ((F.col("cnt") - 1) * F.col("sumk")).alias("key_checksum"),
    )
    return (
        cross.unionByName(same)
        .groupBy("dist")
        .agg(
            F.sum("n_pairs").cast("bigint").alias("n_pairs"),
            F.sum("key_checksum").cast("bigint").alias("key_checksum"),
        )
        .select(F.col("dist").cast("int").alias("dist"), "n_pairs", "key_checksum")
    )
