"""Round-15 optimization pins.

The Gopher battery moved from JVM expressions to one Arrow-batched
pass (plans/quality_queries._gopher_battery). The cross-engine value
hash lives in tests/test_oracle_parity.py; this pins the per-doc
COLUMN equality of the two formulations — the stronger property the
rewrite relies on — on adversarial strings the corpus may not contain
(leading/trailing/multiple whitespace, tabs/newlines, repeated
bigrams, mixed-case stopwords, empty-ish docs, a NULL doc).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ariadne_cartograph_spark.functions import text as T
from ariadne_cartograph_spark.plans.quality_queries import _gopher_per_doc


def _jvm_per_doc(docs):
    toks = T.tokens("text")
    sw = F.array(*[F.lit(s) for s in T.STOPWORDS])
    return docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("long").alias("n_nospace"),
        F.greatest(F.size(toks) - 1, F.lit(0)).cast("long").alias("n_grams"),
        F.size(T.word_shingles("text", n=2)).cast("long").alias("n_distinct"),
        F.size(
            F.filter(T.tokens(F.lower(F.col("text"))), lambda w: F.array_contains(sw, w))
        ).cast("long").alias("n_stop"),
    )


TRICKY = [
    ("a", "the quick brown fox"),
    ("a", "  leading and trailing  "),
    ("a", "tab\tand\nnewline\rmix"),
    ("a", "dup dup dup dup dup"),
    ("a", "ab ab ba ab ba ba"),
    ("b", "THE The the tHe"),
    ("b", "x"),
    ("b", ""),
    ("b", " "),
    ("b", "a  b   c    d"),
    ("b", "Is it IN the OF and OR an A to"),
    ("c", None),
    ("c", "ünïcödé wörds ünïcödé wörds"),
    ("c", "1 2 3 1 2 3 1 2"),
]


def _key(rows):
    return sorted(map(tuple, rows), key=repr)


def test_gopher_arrow_battery_matches_jvm_on_tricky_strings(spark):
    docs = spark.createDataFrame(
        [(s, t, float(i)) for i, (s, t) in enumerate(TRICKY)],
        "source string, text string, pad double",
    )
    assert _key(_jvm_per_doc(docs).collect()) == _key(_gopher_per_doc(docs).collect())


def test_gopher_arrow_battery_matches_jvm_on_real_docs(spark, sf_dir):
    from ariadne_cartograph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert _key(_jvm_per_doc(docs).collect()) == _key(_gopher_per_doc(docs).collect())
