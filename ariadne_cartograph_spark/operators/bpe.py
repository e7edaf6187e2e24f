"""In-engine BPE merge training (U5 "model in the engine" family,
with the logreg classifier, k-means, and the bigram LM): learn
byte-pair-encoding merges from the corpus's own word frequencies —
the public Sennrich et al. 2016 algorithm ("Neural Machine
Translation of Rare Words with Subword Units"), trained as Spark
aggregates.

Key scale property (same as the original): after ONE corpus-scale
token count, training runs entirely on the WORD-FREQUENCY table — a
vocabulary-sized relation, not data. Each merge round is

  pair counts   one explode + groupBy over the words table, weighted
                by word frequency (map-side combinable);
  best pair     a deterministic top-1 (count desc, pair lexicographic);
  apply merge   a row-local left-greedy fold over each word's symbol
                array (non-overlapping, leftmost-first — Sennrich's
                replacement order), lineage-truncated per round.

Driver state is the merge list (the model, ≤ n_merges rows); per-round
collects are 1 row. At 100 TB the only corpus-touching stage is the
initial word count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# End-of-word marker (Sennrich): lets a merge distinguish word-final
# units ("est</w>") from word-internal ones ("est"), and makes
# detokenization unambiguous.
EOW = "</w>"


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) corpus word frequencies — the ONLY corpus-scale scan
    of BPE training. Tokens split on ``\\s+``, empty tokens dropped
    (repo-wide convention)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """word → array of single-character symbols + EOW terminal."""
    chars = F.split(word, "")
    # Spark's split("abc", "") yields ["a","b","c"] (no empty tail).
    return F.concat(chars, F.array(F.lit(EOW)))


def _adjacent_pairs(sym: F.Column) -> F.Column:
    return F.when(
        F.size(sym) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(sym) - 1),
            lambda i: F.struct(
                F.element_at(sym, i).alias("a"),
                F.element_at(sym, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _apply_merge(sym: F.Column, a: str, b: str) -> F.Column:
    """Left-greedy non-overlapping replacement of adjacent (a, b) with
    the concatenated symbol — one fold over the array. ``F.get`` (not
    element_at) reads the accumulator tail so the empty-accumulator
    probe yields NULL instead of an ANSI index error."""
    merged = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    min_pair_count: int = 2,
) -> list[dict]:
    """Learn up to ``n_merges`` BPE merges. Returns the ordered merge
    list as dicts: {step, left, right, merged, pair_count}. Training
    stops early when no remaining adjacent pair reaches
    ``min_pair_count`` (merging a frequency-1 pair memorizes noise).

    Deterministic: the best pair is (weighted count desc, left asc,
    right asc) — reproducible across runs, partitionings, and engines
    (integer counts only, no floats anywhere).
    """
    words = (
        word_freq_table(df, text_col)
        .select(_initial_symbols(F.col("word")).alias("sym"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        best = (
            words.select("n", F.explode(_adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append(
            {"step": step, "left": a, "right": b, "merged": a + b, "pair_count": c}
        )
        # Apply + truncate lineage: the fold expression would otherwise
        # nest n_merges deep and stall codegen long before data cost
        # matters (same device as the connected-components rounds).
        words = words.select(
            _apply_merge(F.col("sym"), a, b).alias("sym"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment_words(
    words: DataFrame, word_col: str, merges: list[dict]
) -> DataFrame:
    """Apply a trained merge list to a words frame → ``sym``
    array<string> subword segmentation (greedy, in merge order — the
    standard BPE apply). Iterative column folds with periodic lineage
    truncation; cost is |merges| row-local passes over a
    vocabulary-sized frame."""
    out = words.withColumn("sym", _initial_symbols(F.col(word_col)))
    for i, m in enumerate(merges):
        out = out.withColumn(
            "sym", _apply_merge(F.col("sym"), m["left"], m["right"])
        )
        if (i + 1) % 4 == 0:
            out = out.localCheckpoint(eager=True)
    return out
