"""Corpus-quality / PII / semantic-dedup catalog entries — the
pre-training curation rule family (north-star "text analysis" + W6
dedup; public heuristics in the shape of C4/Gopher rule filters and
SemDeDup, not any specific implementation).

All text rules are pure column expressions (JVM-side, codegen'd — scan
speed at 100 TB). Rule boundaries that land on rational fractions are
compared in INTEGER math (e.g. ``20·dup ≤ total`` instead of
``dup/total ≤ 0.05``) so the oracle comparison can never flip on a
last-ulp double difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import similarity as S
from ..sources.tables import fan_out, load_table
from .catalog import register

_STOPLIST_SQL = "['the','a','an','and','or','of','to','in','is','it']"

# Arrow schema of the per-doc Gopher battery (see _gopher_per_doc).
_GOPHER_PER_DOC_SCHEMA = (
    "source string, n_tok long, n_nospace long, n_grams long, "
    "n_distinct long, n_stop long"
)


def _gopher_battery(batches):
    """Per-doc Gopher counters over Arrow record batches (guide §4.2):
    ONE regex tokenization per doc (pyarrow's RE2 `\\s+` split matches
    the JVM/DuckDB splits byte-for-byte — equality pinned per column in
    tests/test_round15_entries.py), then dictionary-coded numpy set
    ops for the distinct-bigram census and a value-set membership scan
    for stopwords. Replaces a JVM battery that re-split the text three
    times (tokens, 2-gram shingles, lowered tokens) — measured r15
    interleaved A/B: sf1 4.48 → 4.21 s, sf0.1 0.96 → 0.75 s, Arrow arm
    faster in every pair and with visibly lower variance (the JVM arm's
    regex battery is allocation-heavy). lower() commutes with the \\s+
    split (no Unicode case mapping creates or destroys ASCII
    whitespace), so stopwords scan the already-split tokens. NULL text
    yields NULL counters, matching size(split(NULL)) semantics."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    stop_arr = pa.array(sorted(T.STOPWORDS))
    for b in batches:
        text = b.column(b.schema.get_field_index("text"))
        src = b.column(b.schema.get_field_index("source"))
        toks = pc.split_pattern_regex(text, r"\s+")
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        n_tok = (offs[1:] - offs[:-1]).astype("int64")
        n_nospace = (
            pc.utf8_length(pc.replace_substring(text, " ", ""))
            .to_numpy(zero_copy_only=False)
            .astype("int64")
        )
        n_grams = np.maximum(n_tok - 1, 0)
        # distinct adjacent bigrams per row: dictionary-encode tokens →
        # int codes, pair adjacent codes, drop row-boundary pairs,
        # count distinct (row, pair) keys.
        flat = toks.values
        codes = (
            pc.dictionary_encode(flat)
            .indices.to_numpy(zero_copy_only=False)
            .astype("int64")
        )
        n = len(codes)
        if n > 1:
            pair = codes[:-1] * (codes.max() + 1) + codes[1:]
            pos = np.arange(n - 1)
            row_of = np.searchsorted(offs, pos, side="right") - 1
            valid = pos + 1 < offs[row_of + 1]  # pair must not cross rows
            rp = np.unique(np.stack([row_of[valid], pair[valid]]), axis=1)
            n_distinct = np.bincount(rp[0], minlength=len(n_tok)).astype("int64")
        else:
            n_distinct = np.zeros(len(n_tok), dtype="int64")
        isstop = pc.is_in(pc.utf8_lower(flat), value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        cum = np.concatenate([[0], np.cumsum(isstop.astype("int64"))])
        n_stop = cum[offs[1:]] - cum[offs[:-1]]
        cols = [pa.array(c) for c in (n_tok, n_nospace, n_grams, n_distinct, n_stop)]
        if text.null_count:
            # match the JVM formulation on NULL text: size(split(NULL))
            # is NULL (n_tok, n_nospace, n_stop), but greatest(NULL, 0)
            # is 0 and the shingle set is empty (n_grams, n_distinct).
            mask = pc.is_null(text)
            nulls = pa.nulls(len(b), pa.int64())
            for i in (0, 1, 4):
                cols[i] = pc.if_else(mask, nulls, cols[i])
        yield pa.record_batch(
            [src, *cols],
            names=["source", "n_tok", "n_nospace", "n_grams", "n_distinct", "n_stop"],
        )


def _gopher_per_doc(docs: DataFrame) -> DataFrame:
    """(source, n_tok, n_nospace, n_grams, n_distinct, n_stop) per doc
    — explicit select() first so the opaque map never widens the scan
    (guide §4.1)."""
    return docs.select("source", "text").mapInArrow(
        _gopher_battery, _GOPHER_PER_DOC_SCHEMA
    )


@register(
    "text_gopher_quality_filters",
    tags=["U5", "W6"],
    oracle=rf"""
WITH t AS (
  SELECT doc_id, source,
         string_split_regex(text, '\s+') AS toks,
         string_split_regex(lower(text), '\s+') AS toks_l,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nospace
  FROM documents),
per_doc AS (
  SELECT doc_id, source,
         CAST(len(toks) AS BIGINT) AS n_tok,
         n_nospace,
         CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_grams,
         CAST(len(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 1, 0)),
             i -> toks[i] || ' ' || toks[i + 1]))) AS BIGINT) AS n_distinct,
         CAST(len(list_filter(toks_l,
             w -> list_contains({_STOPLIST_SQL}, w))) AS BIGINT) AS n_stop
  FROM t),
flags AS (
  SELECT source,
         (n_tok BETWEEN 20 AND 5000) AS pass_len,
         (n_nospace >= 3 * n_tok AND n_nospace <= 5 * n_tok) AS pass_awl,
         (20 * (n_grams - n_distinct) <= n_grams) AS pass_rep,
         (n_stop >= 2) AS pass_stop
  FROM per_doc)
SELECT source,
       count(*) AS n_docs,
       count(*) FILTER (pass_len) AS n_pass_len,
       count(*) FILTER (pass_awl) AS n_pass_awl,
       count(*) FILTER (pass_rep) AS n_pass_rep,
       count(*) FILTER (pass_stop) AS n_pass_stop,
       count(*) FILTER (pass_len AND pass_awl AND pass_rep AND pass_stop) AS n_pass_all
FROM flags
GROUP BY source
ORDER BY source
""",
)
def text_gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-shape rule filters, aggregated per source: token-count
    band, mean-word-length band, duplicate-2-gram fraction, stopword
    presence. One narrow scan + one partial-aggregated groupBy — the
    whole rule battery runs map-side at 100 TB. r15: the per-doc
    counter battery moved from JVM expressions (three regex splits of
    every doc) to one Arrow-batched pass (_gopher_battery — guide §4.2;
    interleaved A/B sf1 4.48 → 4.21 s, sf0.1 0.96 → 0.75 s, every pair
    faster; per-doc equality vs the JVM form pinned in
    tests/test_round15_entries.py)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _gopher_per_doc(docs).select(
        "source",
        (F.col("n_tok").between(20, 5000)).alias("pass_len"),
        (
            (F.col("n_nospace") >= 3 * F.col("n_tok"))
            & (F.col("n_nospace") <= 5 * F.col("n_tok"))
        ).alias("pass_awl"),
        (20 * (F.col("n_grams") - F.col("n_distinct")) <= F.col("n_grams")).alias(
            "pass_rep"
        ),
        (F.col("n_stop") >= 2).alias("pass_stop"),
    )

    def npass(cond: F.Column, name: str) -> F.Column:
        return F.count(F.when(cond, F.lit(1))).alias(name)

    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            npass(F.col("pass_len"), "n_pass_len"),
            npass(F.col("pass_awl"), "n_pass_awl"),
            npass(F.col("pass_rep"), "n_pass_rep"),
            npass(F.col("pass_stop"), "n_pass_stop"),
            npass(
                F.col("pass_len")
                & F.col("pass_awl")
                & F.col("pass_rep")
                & F.col("pass_stop"),
                "n_pass_all",
            ),
        )
        .orderBy("source")
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+\d[\d-]{6,}\d"


@register(
    "text_pii_redact",
    tags=["U5", "P14"],
    oracle=rf"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.' AS t
  FROM documents WHERE doc_id < 50)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
ORDER BY doc_id
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of emails / phone numbers, with
    deterministic synthetic PII injected per doc_id (the test corpus
    contains none) so the redaction path is actually exercised. The
    regexes stay in the Java/RE2 common subset so the DuckDB oracle
    md5-matches the REDACTED TEXT itself, not just the counts. Pure
    regexp_replace column expressions — scan-speed at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now."),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        docs.select(
            "doc_id",
            F.regexp_count(aug, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
            F.regexp_count(aug, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
            F.md5(redacted).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "embedding_semantic_dedup",
    tags=["U4", "W6"],
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS cv
  FROM e ORDER BY vec_id LIMIT 16),
assign AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cent.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, cent.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))
             DESC, cent.cell ASC) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1),
dropped AS (
  SELECT DISTINCT b.cell, b.vec_id
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS FLOAT) >= 0.35)
SELECT a.cell,
       count(*) AS n_vecs,
       count(d.vec_id) AS n_dropped,
       count(*) - count(d.vec_id) AS n_kept
FROM assign a LEFT JOIN dropped d ON a.cell = d.cell AND a.vec_id = d.vec_id
GROUP BY a.cell
ORDER BY a.cell
""",
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup summary: coarse-quantizer cells,
    within-cell cosine >= 0.35 drops all but the min id. The
    driver-checked form uses centroids="first" so the DuckDB oracle can
    rebuild the identical quantizer (same convention as
    similarity_ann_ivf); centroids="hash" is the scale default. The
    within-cell pair join is the whole point at 100 TB: comparison
    volume is per-cell-quadratic, corpus shuffles once on cell."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    flags = S.semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.35, n_centroids=16, centroids="first"
    )
    return (
        flags.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count(F.when(F.col("is_dropped"), F.lit(1))).alias("n_dropped"),
            (
                F.count(F.lit(1)) - F.count(F.when(F.col("is_dropped"), F.lit(1)))
            ).alias("n_kept"),
        )
        .orderBy("cell")
    )


@register(
    "text_repetition_profile",
    tags=["U5"],
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks
  FROM documents WHERE doc_id < 100),
g AS (
  SELECT doc_id,
         CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_grams,
         CAST(len(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 1, 0)),
             i -> toks[i] || ' ' || toks[i + 1]))) AS BIGINT) AS n_distinct
  FROM t)
SELECT doc_id, n_grams, n_distinct,
       CAST(CASE WHEN n_grams > 0
                 THEN CAST(n_grams - n_distinct AS DOUBLE) / n_grams
                 ELSE 0.0 END AS FLOAT) AS dup_frac
FROM g
ORDER BY doc_id
""",
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate word-2-gram fraction — the repetition
    signal behind the gopher pass_rep flag, exposed per doc. Array-native
    shingling (no explode): zero shuffle before the final sort."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = T.tokens("text")
    n_grams = F.greatest(F.size(toks) - 1, F.lit(0)).cast("long")
    n_distinct = F.size(T.word_shingles("text", n=2)).cast("long")
    dup_frac = (
        F.when(
            F.col("n_grams") > 0,
            (F.col("n_grams") - F.col("n_distinct")).cast("double")
            / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .cast("float")
    )
    return (
        docs.select(
            "doc_id", n_grams.alias("n_grams"), n_distinct.alias("n_distinct")
        )
        .withColumn("dup_frac", dup_frac)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Perplexity-proxy quality scoring (operators/lm.py): mean token
# log-prob under the corpus's own add-1 unigram LM — the CCNet-style
# "LM score" curation signal, self-trained so no external model ships.
# The mean is f32-cast on both sides (log sums differ in final double
# ulps across engines; SURVEY.md §5.2 float policy).
# --------------------------------------------------------------------------


@register(
    "text_unigram_logprob",
    tags=["U5", "A5"],
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
vocab AS (
  SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY tok),
stats AS (SELECT sum(c) AS n, CAST(count(*) AS DOUBLE) AS v FROM vocab),
scored AS (
  SELECT t.doc_id, ln((vocab.c + 1.0) / (stats.n + 1.0 * stats.v)) AS lp
  FROM toks t JOIN vocab USING (tok) CROSS JOIN stats)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(avg(lp) AS FLOAT) AS mean_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs, "doc_id", "text", k=1.0).orderBy("doc_id")


# --------------------------------------------------------------------------
# Cross-document repeated spans (operators/dedup.repeated_span_coverage):
# the exact-substring dedup signal (Lee et al. 2022) at k-token window
# granularity. Spark counts hashed grams (8-byte shuffle keys); the
# oracle replays with gram STRINGS — identical counts absent a 2^-64
# hash collision, and the output carries only counts.
# --------------------------------------------------------------------------

_SPAN_K = 8


@register(
    "text_repeated_spans",
    tags=["W6", "U5"],
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
w AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(t) - {_SPAN_K} + 1, 0) + 1),
           i -> concat_ws(' ', list_slice(t, i, i + {_SPAN_K} - 1)))) AS gram
  FROM toks),
rep AS (
  SELECT gram FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
per AS (
  SELECT w.doc_id,
         count(*) AS n_windows,
         count(*) FILTER (WHERE w.gram IN (SELECT gram FROM rep)) AS n_repeated
  FROM w GROUP BY w.doc_id)
SELECT doc_id,
       CAST(n_windows AS BIGINT) AS n_windows,
       CAST(n_repeated AS BIGINT) AS n_repeated,
       CAST(CAST(n_repeated AS DOUBLE) / n_windows AS FLOAT) AS repeated_frac
FROM per ORDER BY doc_id
""",
)
def text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import repeated_span_coverage

    docs = load_table(spark, sf_dir, "documents")
    return repeated_span_coverage(
        docs, "doc_id", "text", k=_SPAN_K, min_docs=2
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Cross-document repeated-span REMOVAL (operators/dedup.
# remove_repeated_spans): the rewrite half of exact-substring dedup —
# tokens covered by any cross-doc-repeated k-window are cut and the
# cleaned text is re-emitted (as an md5, keeping output count-sized).
# The oracle replays with gram STRINGS and a ROWS-frame window max —
# identical absent a 2^-64 xxhash64 collision.
# --------------------------------------------------------------------------


@register(
    "text_repeated_span_removal",
    headline=True,
    tags=["W6", "U5"],
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
w AS (
  SELECT doc_id, i AS tpos, t[i] AS tok,
         CASE WHEN i <= len(t) - {_SPAN_K} + 1
              THEN concat_ws(' ', list_slice(t, i, i + {_SPAN_K} - 1)) END AS gram
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
rep AS (
  SELECT gram FROM w WHERE gram IS NOT NULL
  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT doc_id, tpos, tok,
         max(CASE WHEN gram IN (SELECT gram FROM rep) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY tpos
                 ROWS BETWEEN {_SPAN_K - 1} PRECEDING AND CURRENT ROW) AS covered
  FROM w)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(covered) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(CASE WHEN covered = 0 THEN tok END, ' '
                               ORDER BY tpos), '')) AS clean_md5
FROM cov GROUP BY doc_id ORDER BY doc_id
""",
)
def text_repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import remove_repeated_spans

    docs = load_table(spark, sf_dir, "documents")
    out = remove_repeated_spans(docs, "doc_id", "text", k=_SPAN_K, min_docs=2)
    # clean_md5 is never null; the filter exists so count()-based
    # harnesses (bench warm-up, ab_entry) cannot join-eliminate the
    # whole pipeline — the aggregated `starts` side has provably-unique
    # keys, so an unreferenced left join is legally pruned and a
    # count() would measure a bare document scan.
    return out.filter(F.col("clean_md5").isNotNull()).orderBy("doc_id")


# --------------------------------------------------------------------------
# Cross-modal curation capstone: documents ⋈ embeddings (shared id
# space) under a prioritized decision rule — quality_fail > text_dup >
# semantic_dup > kept. The composite a real training-data pipeline
# runs: cheap column-math rules first, then content dedup, then the
# embedding-space near-dup drop; each stage's machinery is the same
# oracled operator the standalone entries use.
# --------------------------------------------------------------------------


@register(
    "corpus_multimodal_curation",
    tags=["W6", "U4", "U5", "J6"],
    oracle="""
WITH q AS (
  SELECT doc_id, source,
         len(string_split_regex(text, '\\s+')) BETWEEN 20 AND 5000 AS q_ok,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
  FROM documents),
keep_fp AS (SELECT fp, min(doc_id) AS keeper FROM q GROUP BY fp),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS cv
  FROM e ORDER BY vec_id LIMIT 16),
assign AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cent.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, cent.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))
             DESC, cent.cell ASC) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1),
sem_drop AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS FLOAT) >= 0.35),
decided AS (
  SELECT q.source, q.doc_id,
         CASE WHEN NOT q.q_ok THEN '1_quality_fail'
              WHEN q.doc_id <> k.keeper THEN '2_text_dup'
              WHEN s.vec_id IS NOT NULL THEN '3_semantic_dup'
              ELSE '4_kept' END AS decision
  FROM q
  JOIN keep_fp k ON k.fp = q.fp
  LEFT JOIN sem_drop s ON s.vec_id = q.doc_id)
SELECT source, decision,
       count(*) AS n,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM decided GROUP BY source, decision ORDER BY source, decision
""",
)
def corpus_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import normalize_text

    from ..operators.dedup import _track_persist

    docs = load_table(spark, sf_dir, "documents")
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    # Persisted: q is consumed twice (the keeper groupBy and the final
    # decision join), and without the break each consumer re-runs the
    # normalize+md5 scan — and the inner join on fp would let
    # InferFiltersFromConstraints push isnotnull(<md5 expression>) into
    # the parquet scan as a data filter (the simhash lesson). The frame
    # is (id, source, bool, 32-char fp) per doc — scan-output-sized.
    q = _track_persist(
        docs.select(
            "doc_id",
            "source",
            T.token_count("text").between(20, 5000).alias("q_ok"),
            F.md5(normalize_text("text")).alias("fp"),
        )
    )
    keep_fp = q.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    sem = (
        S.semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.35, n_centroids=16, centroids="first"
        )
        .filter(F.col("is_dropped"))
        .select(F.col("id").alias("__sem_id"))
    )
    decision = (
        F.when(~F.col("q_ok"), F.lit("1_quality_fail"))
        .when(F.col("doc_id") != F.col("keeper"), F.lit("2_text_dup"))
        .when(F.col("__sem_id").isNotNull(), F.lit("3_semantic_dup"))
        .otherwise(F.lit("4_kept"))
    )
    return (
        q.join(keep_fp, "fp")
        .join(sem, q.doc_id == F.col("__sem_id"), "left")
        .select("source", "doc_id", decision.alias("decision"))
        .groupBy("source", "decision")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("source", "decision")
    )


@register(
    "corpus_domain_cap",
    tags=["U5", "W6", "W3"],
    oracle=r"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents)
SELECT doc_id, source, n_chars FROM ranked
WHERE rn <= 5
ORDER BY source, n_chars DESC, doc_id
""",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain over-representation cap (the C4/RefinedWeb-style
    "no domain dominates the corpus" rule): keep the top 5 docs per
    source by length, deterministic doc_id tie-break.

    Runs through operators/skew.salted_topk_per_key — two bounded
    window phases instead of one full sort per domain, because at
    crawl scale a single hot domain funnels through one reducer under
    the plain window (AQE does not split window partitions). Lossless
    vs the plain window (pinned in tests/test_skew.py); the oracle IS
    the plain window.
    """
    from ..operators.skew import salted_topk_per_key

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kept = salted_topk_per_key(
        docs, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], k=5
    )
    return kept.orderBy("source", F.col("n_chars").desc(), "doc_id")


# --------------------------------------------------------------------------
# In-engine trained quality classifier (operators/classifier.py):
# 5 iterations of batch-GD logistic regression (label: lang='en';
# features: token count and char count, normalized by exact integer/
# constant division so both engines see bit-identical inputs). The
# oracle REPLAYS THE WHOLE TRAINING LOOP as unrolled CTEs with the
# same per-iteration float32 weight rounding, then both sides report
# per-source predictions AND the final weights — the hash checks the
# entire training trajectory, not just the scores.
# --------------------------------------------------------------------------

_LR_ITER, _LR_RATE = 5, 0.5
_LR_FEATS_SQL = (
    "len(string_split_regex(text, '\\s+')) / 100.0 AS x1, "
    "n_chars / 1000.0 AS x2"
)


def _logreg_oracle(n_iter: int = _LR_ITER, lr: float = _LR_RATE) -> str:
    ctes = [
        f"""feats AS (
  SELECT source,
         {_LR_FEATS_SQL},
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
w0 AS (SELECT CAST(0.0 AS FLOAT) AS wb, CAST(0.0 AS FLOAT) AS w1,
              CAST(0.0 AS FLOAT) AS w2)"""
    ]
    for t in range(1, n_iter + 1):
        ctes.append(f"""p{t} AS (
  SELECT y, x1, x2,
         1.0 / (1.0 + exp(-(w.wb + w.w1 * x1 + w.w2 * x2))) AS p
  FROM feats, w{t - 1} w),
g{t} AS (
  SELECT avg(p - y) AS g0, avg((p - y) * x1) AS g1, avg((p - y) * x2) AS g2
  FROM p{t}),
w{t} AS (
  SELECT CAST(w.wb - {lr} * g.g0 AS FLOAT) AS wb,
         CAST(w.w1 - {lr} * g.g1 AS FLOAT) AS w1,
         CAST(w.w2 - {lr} * g.g2 AS FLOAT) AS w2
  FROM w{t - 1} w, g{t} g)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN 1.0 / (1.0 + exp(-(w.wb + w.w1 * x1 + w.w2 * x2))) > 0.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en,
       CAST(avg(1.0 / (1.0 + exp(-(w.wb + w.w1 * x1 + w.w2 * x2)))) AS FLOAT) AS avg_p,
       w.wb AS w_bias, w.w1 AS w_ntok, w.w2 AS w_nchars
FROM feats, w{n_iter} w
GROUP BY source, w.wb, w.w1, w.w2
ORDER BY source"""
    )


@register("text_quality_logreg", tags=["U5", "A5"], oracle=_logreg_oracle())
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import logreg_score, train_logreg

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "source",
        (F.size(F.split(F.col("text"), r"\s+")) / F.lit(100.0)).alias("x1"),
        (F.col("n_chars") / F.lit(1000.0)).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    w = train_logreg(feats, ["x1", "x2"], "y", n_iter=_LR_ITER, lr=_LR_RATE)
    p = logreg_score(["x1", "x2"], w)
    return (
        feats.select("source", p.alias("p"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("p") > 0.5, 1).otherwise(0)).cast("bigint").alias("n_pred_en"),
            F.avg("p").cast("float").alias("avg_p"),
        )
        .withColumn("w_bias", F.lit(w[0]).cast("float"))
        .withColumn("w_ntok", F.lit(w[1]).cast("float"))
        .withColumn("w_nchars", F.lit(w[2]).cast("float"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Bigram-LM quality scoring (operators/lm.py): train an add-1 bigram LM
# on the corpus's own token stream with two aggregates, score every doc
# by mean log-likelihood — the CCNet-style perplexity-proxy filter. The
# model is relations (bigram/context count tables joined back on their
# own keys) plus one broadcast scalar (vocab size); no driver state.
# --------------------------------------------------------------------------


@register(
    "text_bigram_lm_quality",
    tags=["U5", "A5", "J6"],
    oracle=r"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents),
pairs AS (
  SELECT doc_id, b['prev'] AS prev, b['cur'] AS cur
  FROM (
    SELECT doc_id, unnest(list_transform(range(2, greatest(len(tk), 1) + 1),
           i -> {'prev': tk[i-1], 'cur': tk[i]})) AS b
    FROM t)),
big AS (SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c_bg FROM pairs GROUP BY prev, cur),
ctx AS (SELECT prev, CAST(count(*) AS DOUBLE) AS c_ctx FROM pairs GROUP BY prev),
v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM
      (SELECT prev AS tok FROM pairs UNION ALL SELECT cur FROM pairs)),
ll AS (
  SELECT p.doc_id, ln((big.c_bg + 1.0) / (ctx.c_ctx + 1.0 * v.v)) AS ll
  FROM pairs p JOIN big USING (prev, cur) JOIN ctx USING (prev) CROSS JOIN v),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(avg(ll) AS FLOAT) AS lm_score
  FROM ll GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       per.lm_score
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY doc_id
""",
)
def text_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import bigram_lm_doc_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_doc_scores(docs, "doc_id", "text", alpha=1.0).orderBy("doc_id")


# --------------------------------------------------------------------------
# Length-bucketed batch assembly + padding-waste accounting (north-star
# corpus assembly: the efficiency analysis behind training batching —
# padding waste = Σ(batch_max_len − doc_len) over each batch). Buckets
# are FIXED-WIDTH length classes (floor(n_tok/64) — scan-local column
# math, never a global ntile sort); within a bucket the batch
# assignment is the deterministic (n_tok, doc_id) order chopped into
# 32-doc batches. The only ordered operation is a per-bucket
# row_number — partitioned by bucket, so the sort is bounded per
# bucket, not global. All-integer output → exact hash at every scale.
# --------------------------------------------------------------------------

_BATCH_SIZE = 32
_LEN_BUCKET = 64


@register(
    "corpus_length_bucket_batches",
    tags=["U5", "W3", "A5"],
    oracle=rf"""
WITH t AS (
  SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tok FROM documents),
b AS (
  SELECT doc_id, n_tok, CAST(n_tok // {_LEN_BUCKET} AS INT) AS bucket FROM t),
r AS (
  SELECT bucket, n_tok,
         CAST((row_number() OVER (PARTITION BY bucket ORDER BY n_tok, doc_id) - 1)
              // {_BATCH_SIZE} AS BIGINT) AS batch_id
  FROM b)
SELECT bucket, batch_id,
       count(*) AS n_docs,
       CAST(max(n_tok) AS BIGINT) AS batch_max_len,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST(max(n_tok) * count(*) - sum(n_tok) AS BIGINT) AS padding_waste
FROM r GROUP BY bucket, batch_id
ORDER BY bucket, batch_id
""",
)
def corpus_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tok")
    ).withColumn(
        "bucket", F.floor(F.col("n_tok") / _LEN_BUCKET).cast("int")
    )
    w = W.partitionBy("bucket").orderBy("n_tok", "doc_id")
    r = t.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / _BATCH_SIZE).cast("bigint"),
    )
    return (
        r.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").cast("bigint").alias("batch_max_len"),
            F.sum("n_tok").cast("bigint").alias("sum_tok"),
            (F.max("n_tok") * F.count(F.lit(1)) - F.sum("n_tok"))
            .cast("bigint")
            .alias("padding_waste"),
        )
        .orderBy("bucket", "batch_id")
    )


# --------------------------------------------------------------------------
# Per-source quality-quantile pruning (r14 continuation, U5/A5/W6):
# "drop each source's bottom quartile by quality score" — the
# per-domain pruning rule curation pipelines apply before mixing. The
# boundary is the EXACT discrete P25 (smallest score whose ascending
# cumulative count reaches ceil(n/4), ceil as (n+3) DIV 4 — pure
# integers). Scale: the engine never ranks documents — it aggregates a
# (source, score) VALUE HISTOGRAM (bounded by |sources| × |score
# domain|, independent of corpus size), runs the cumulative window
# over the histogram, and broadcast-joins the 1-row-per-source
# boundary back for the census. The oracle ranks documents directly
# (row_number per source — fine at oracle scale), cross-checking the
# histogram formulation against per-row rank semantics.
# --------------------------------------------------------------------------


@register(
    "corpus_quality_prune_per_source",
    tags=["U5", "A5", "W6"],
    oracle="""
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents),
bound AS (
  SELECT source, n AS n_total, n_chars AS boundary_chars
  FROM ranked WHERE rk = (n + 3) // 4),
census AS (
  SELECT d.source,
         count(*) FILTER (WHERE d.n_chars >= b.boundary_chars) AS n_kept,
         sum(d.n_chars) FILTER (WHERE d.n_chars >= b.boundary_chars) AS kept_chars
  FROM documents d JOIN bound b ON b.source = d.source
  GROUP BY d.source)
SELECT bound.source,
       CAST(bound.n_total AS BIGINT) AS n_total,
       CAST(bound.boundary_chars AS BIGINT) AS boundary_chars,
       CAST(census.n_kept AS BIGINT) AS n_kept,
       CAST(census.kept_chars AS BIGINT) AS kept_chars
FROM bound JOIN census ON census.source = bound.source
ORDER BY bound.source
""",
)
def corpus_quality_prune_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    # no fan_out: this is a 2-integer-column scan feeding a hash
    # aggregate — the round-robin respread exists for CPU-bound text
    # parsing on few input splits and here it IS the cost (isolated
    # sf1 A/B: 4.5 s cold with fan_out vs 1.0 s without, same hash)
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    hist = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    # cumulative count over the VALUE HISTOGRAM — the window runs over
    # |sources| × |distinct scores| rows, not over documents
    wc = (
        W.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n_total", F.sum("cnt").over(W.partitionBy("source"))
    )
    bound = (
        cum.filter(F.col("cum") >= F.expr("(n_total + 3) DIV 4"))
        .groupBy("source", "n_total")
        .agg(F.min("n_chars").alias("boundary_chars"))
    )
    census = (
        docs.join(F.broadcast(bound), "source")
        .groupBy("source", "n_total", "boundary_chars")
        .agg(
            F.count(F.when(F.col("n_chars") >= F.col("boundary_chars"), 1)).alias(
                "n_kept"
            ),
            F.sum(
                F.when(F.col("n_chars") >= F.col("boundary_chars"), F.col("n_chars"))
            ).alias("kept_chars"),
        )
    )
    return census.select(
        "source",
        F.col("n_total").cast("long").alias("n_total"),
        F.col("boundary_chars").cast("long").alias("boundary_chars"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("kept_chars").cast("long").alias("kept_chars"),
    ).orderBy("source")
