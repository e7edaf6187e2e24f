"""Exact sf1-replica oracles for the pair/dedup family (r13 verdict
task #5: shrink the rehearsal's spark-only set).

The scale-rehearsal replica (tools/make_sf.py) is a base testdata
directory replicated K× with constant per-key-space id offsets and
otherwise IDENTICAL rows: copy i of document a carries id
``a + i*OFF`` and the same text. For operators that are pure functions
of (id, text) — the exact n-gram pair relations and the id-ordered
incremental dedup — the TRUE replica output is therefore an analytic
function of the BASE relation (the rows with id < OFF) and the replica
combinatorics, so the rehearsal can value-hash them at sf1 without the
oracle ever materializing the 100×-blown pair set:

- every base pair (a, b) induces K² cross-copy pairs with the SAME
  score (the texts are identical), each counted exactly once under the
  id_a < id_b output convention (for copies i <= j the ordered pair is
  (a_i, b_j), for i > j it is (b_j, a_i));
- every doc with a NONEMPTY shingle set induces C(K,2) = T self pairs
  at score exactly 1 (identical copies); empty-set docs pair with
  nothing (the 0/0 NULL-reject contract);
- id checksums expand in closed form: with S = Σ(id_a+id_b) over base
  pairs, B base pairs, D nonempty docs, SD their id sum and
  T = K(K-1)/2,
      Σ_sf1(id_a+id_b) = K²·S + 2·K·T·OFF·B + 2·T·SD + (K-1)·T·OFF·D
  (cross pairs contribute the first two terms, self pairs the rest).

These oracles are valid ONLY for a make_sf.py-shaped directory (OFF is
recovered in SQL as (max(id)+1) // K, exact because the replica's id
range is dense blocks); the combinatorics are pinned against a K=3
replica built from scratch in tests/test_replica_oracles.py.

The quantized-score checksum sums per-pair floor(score·1e6): both
engines derive every score from the same integer (n_inter, n_sh)
tuples with one IEEE divide, so the floors agree bit-for-bit; the
expansion multiplies base floors (scores replicate exactly) and adds
T·D·1_000_000 for the self pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The rehearsal replica factor (tools/make_sf.py default).
REPLICA_K = 10

# DuckDB 3-gram shingle CTE over the base subset — the same derivation
# as the entries' own oracles (plans/text_queries.py), restricted to
# doc_id < OFF.
_BASE_SHINGLES = r"""
p AS (SELECT (max(doc_id)+1)//{k} AS off FROM documents),
base AS (SELECT doc_id, source, text FROM documents
         WHERE doc_id < (SELECT off FROM p)),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(string_split_regex(text,'\s+')) - 2, 0) + 1),
                   i -> concat_ws(' ',
                        string_split_regex(text,'\s+')[i],
                        string_split_regex(text,'\s+')[i+1],
                        string_split_regex(text,'\s+')[i+2])))) AS g
  FROM base),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
"""


def pair_census(df: DataFrame, score_col: str) -> DataFrame:
    """Engine-side census of a (id_a, id_b, score) pair frame: count,
    id checksum, and the quantized score checksum. Pure JVM-side
    aggregation — the rehearsal never collects the blown-up pair set."""
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum(F.col("id_a") + F.col("id_b")), F.lit(0))
        .cast("long")
        .alias("sum_ids"),
        F.coalesce(
            F.sum(F.floor(F.col(score_col) * F.lit(1000000.0))), F.lit(0)
        )
        .cast("long")
        .alias("q_score"),
    )


def _census_select(k: int) -> str:
    t = k * (k - 1) // 2
    return f"""
agg AS (SELECT count(*) AS b, coalesce(sum(id_a+id_b), 0) AS s,
               coalesce(sum(q), 0) AS q FROM bp),
ne AS (SELECT count(*) AS d, coalesce(sum(doc_id), 0) AS sd FROM sizes)
SELECT CAST({k * k}*b + {t}*d AS BIGINT) AS n_pairs,
       CAST({k * k}*s + {2 * k * t}*(SELECT off FROM p)*b
            + {2 * t}*sd + {(k - 1) * t}*(SELECT off FROM p)*d
            AS BIGINT) AS sum_ids,
       CAST({k * k}*q + {t}*d*1000000 AS BIGINT) AS q_score
FROM agg, ne
"""


def jaccard_census_sql(k: int = REPLICA_K, threshold: float = 0.6) -> str:
    """Replica census oracle for ngram_jaccard_near_dup (exact
    AllPairs relation — complete by construction, so the base subset
    relation IS the base output)."""
    score = "CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)"
    return f"""
WITH {_BASE_SHINGLES.format(k=k)},
bp AS (
  SELECT id_a, id_b, CAST(floor(({score}) * 1000000.0) AS BIGINT) AS q
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE {score} >= {threshold}),
{_census_select(k)}
"""


def containment_census_sql(k: int = REPLICA_K, threshold: float = 0.7) -> str:
    """Replica census oracle for ngram_containment_pairs (identical
    copies have containment exactly 1)."""
    score = "CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh)"
    return f"""
WITH {_BASE_SHINGLES.format(k=k)},
bp AS (
  SELECT id_a, id_b, CAST(floor(({score}) * 1000000.0) AS BIGINT) AS q
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE {score} >= {threshold}),
{_census_select(k)}
"""


def incremental_census_sql(k: int = REPLICA_K, threshold: float = 0.6) -> str:
    """Replica oracle for docs_incremental_dedup_parity — the SAME
    output schema as the entry (no census wrapper needed). Under the
    id-ordered arrival contract a copy a_i (i >= 1) is always dropped
    against a_0 when its shingle set is nonempty (Jaccard exactly 1),
    and a_0 is dropped iff the base rule drops it; empty-set docs pair
    with nothing, so EVERY copy survives. Hence per source:
    n_docs = K·base, n_kept = base_kept + (K-1)·n_empty, and the kept
    checksum adds (K-1)·Σ_empty(a) + T·OFF·n_empty for the surviving
    copies."""
    t = k * (k - 1) // 2
    score = "CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)"
    return f"""
WITH {_BASE_SHINGLES.format(k=k)},
pairs AS (
  SELECT id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE {score} >= {threshold}),
d AS (
  SELECT b.doc_id, b.source,
         b.doc_id IN (SELECT id_b FROM pairs) AS dropped,
         b.doc_id NOT IN (SELECT doc_id FROM sizes) AS empty
  FROM base b)
SELECT source,
       CAST({k} * count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE NOT dropped)
            + {k - 1} * count(*) FILTER (WHERE empty) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN NOT dropped THEN doc_id ELSE 0 END)
            + {k - 1} * sum(CASE WHEN empty THEN doc_id ELSE 0 END)
            + {t} * (SELECT off FROM p) * count(*) FILTER (WHERE empty)
            AS BIGINT) AS kept_checksum
FROM d GROUP BY source ORDER BY source
"""


def decontamination_census_sql(k: int = REPLICA_K, threshold: float = 0.02) -> str:
    """Replica census oracle for decontamination_overlap (exact
    two-table n-gram Jaccard — complete by construction).

    The entry's corpus/bench split is ``doc_id % 25`` — id-derived, so
    the expansion is valid ONLY when the split commutes with the
    replica offsets, i.e. OFF % 25 == 0 (true for every driver scale:
    500/500/5000 docs). The SQL checks the precondition and poisons
    n_pairs with -1 when violated, so a replica shape that breaks the
    commute fails the hash loudly instead of passing silently.

    With the split commuting, every copy keeps its class, so no
    cross-copy SELF pairs cross the corpus/bench boundary and the
    replica relation is exactly K² offset copies of the base relation:
        n_pairs = K²·B
        Σ(ids)  = K²·S + K²(K−1)·OFF·B
                  (Σ_{i,j}(c+iOFF+b+jOFF) = K²(c+b) + OFF·K²(K−1))
        Σ(floor(j·1e6)) = K²·Q  (scores replicate exactly)
    """
    score = "CAST(n_inter AS DOUBLE) / (sc.n_c + sb.n_b - n_inter)"
    return rf"""
WITH p AS (SELECT (max(doc_id)+1)//{k} AS off FROM documents),
base AS (SELECT doc_id, text FROM documents
         WHERE doc_id < (SELECT off FROM p)),
corpus AS (SELECT doc_id, text FROM base WHERE doc_id % 25 <> 0),
bench AS (SELECT doc_id, text FROM base WHERE doc_id % 25 = 0),
sh_c AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(string_split_regex(text,'\s+')) - 2, 0) + 1),
                   i -> concat_ws(' ',
                        string_split_regex(text,'\s+')[i],
                        string_split_regex(text,'\s+')[i+1],
                        string_split_regex(text,'\s+')[i+2])))) AS g
  FROM corpus),
sh_b AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(string_split_regex(text,'\s+')) - 2, 0) + 1),
                   i -> concat_ws(' ',
                        string_split_regex(text,'\s+')[i],
                        string_split_regex(text,'\s+')[i+1],
                        string_split_regex(text,'\s+')[i+2])))) AS g
  FROM bench),
sz_c AS (SELECT doc_id, count(*) AS n_c FROM sh_c GROUP BY doc_id),
sz_b AS (SELECT doc_id, count(*) AS n_b FROM sh_b GROUP BY doc_id),
inter AS (
  SELECT c.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh_c c JOIN sh_b b ON c.g = b.g
  GROUP BY 1, 2),
bp AS (
  SELECT id_a, id_b,
         CAST(floor(({score}) * 1000000.0) AS BIGINT) AS q
  FROM inter
  JOIN sz_c sc ON sc.doc_id = id_a
  JOIN sz_b sb ON sb.doc_id = id_b
  WHERE {score} >= {threshold}),
agg AS (SELECT count(*) AS b, coalesce(sum(id_a+id_b), 0) AS s,
               coalesce(sum(q), 0) AS q FROM bp)
SELECT CAST(CASE WHEN (SELECT off FROM p) % 25 = 0
            THEN {k * k}*b ELSE -1 END AS BIGINT) AS n_pairs,
       CAST({k * k}*s + {k * k * (k - 1)}*(SELECT off FROM p)*b
            AS BIGINT) AS sum_ids,
       CAST({k * k}*q AS BIGINT) AS q_score
FROM agg
"""


def two_id_census(df: DataFrame, id_a: str, id_b: str, score_col: str) -> DataFrame:
    """Engine-side census of a two-table pair frame (different id
    column names than pair_census)."""
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum(F.col(id_a) + F.col(id_b)), F.lit(0))
        .cast("long")
        .alias("sum_ids"),
        F.coalesce(
            F.sum(F.floor(F.col(score_col) * F.lit(1000000.0))), F.lit(0)
        )
        .cast("long")
        .alias("q_score"),
    )


def embedding_near_dup_census_sql(k: int = REPLICA_K, threshold: float = 0.45) -> str:
    """Replica census oracle for embedding_near_dup (exact blocked-GEMM
    all-pairs — complete by construction, same single-table id_a<id_b
    convention as the n-gram relations, so `_census_select` applies).

    Self-pair scores are EXACTLY 1.0f: for identical vectors the
    double expression dot/(sqrt·sqrt) differs from 1 by ≤ 2⁻⁵¹, far
    inside float32's 1.19e-7 epsilon, so the f32 cast rounds to 1.0 in
    both engines and floor(score·1e6) contributes exactly 1_000_000
    per self pair (the `{t}·d·1e6` census term). Zero-norm vectors
    (0/0 → NaN/NULL-reject) pair with nothing and are excluded from
    the self-pair population, mirroring the engine's threshold filter
    dropping NaN."""
    cos = (
        "CAST(list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v))) AS FLOAT)"
    )
    return f"""
WITH p AS (SELECT (max(vec_id)+1)//{k} AS off FROM embeddings),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < (SELECT off FROM p)),
bp AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(floor(({cos}) * 1000000.0) AS BIGINT) AS q
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE {cos} >= {threshold}),
sizes AS (SELECT vec_id AS doc_id FROM e WHERE list_dot_product(v, v) > 0),
{_census_select(k)}
"""


def skewed_jaccard_census_sql(k: int = REPLICA_K, threshold: float = 0.6) -> str:
    """Replica census oracle for ngram_jaccard_skewed_corpus — the
    same exact AllPairs relation as ngram_jaccard_near_dup, over the
    boilerplate-suffixed corpus. The suffix is a pure (id, text)
    transform applied identically to every row, so it commutes with
    replication and the standard census expansion holds over the
    TRANSFORMED base relation."""
    from .text_queries import _BOILERPLATE

    base_sh = _BASE_SHINGLES.format(k=k).replace(
        "base AS (SELECT doc_id, source, text FROM documents",
        "base AS (SELECT doc_id, source, text || ' "
        + _BOILERPLATE.replace("'", "''")
        + "' AS text FROM documents",
    )
    score = "CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)"
    return f"""
WITH {base_sh},
bp AS (
  SELECT id_a, id_b, CAST(floor(({score}) * 1000000.0) AS BIGINT) AS q
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE {score} >= {threshold}),
{_census_select(k)}
"""


def semantic_dedup_census_sql(k: int = REPLICA_K, threshold: float = 0.35) -> str:
    """Replica oracle for embedding_semantic_dedup — SAME output schema
    as the entry (16 rows, no census wrapper).

    The drop rule is "dropped iff some smaller-id doc in the same cell
    has cosine >= t". Under the replica: (1) the quantizer is the first
    16 ids = base vectors, so every copy lands in its base twin's cell
    (identical scores, same DESC/cell-ASC tiebreak); (2) every copy
    c_i (i >= 1) has its base twin c_0 < OFF <= c_i in the same cell
    at cosine exactly 1.0f (the embedding_near_dup argument) >= t, so
    ALL (K-1)·n copies drop; (3) a base-block doc only sees base-block
    smaller ids (copies all have ids >= OFF), so base statuses are
    exactly the base run's. Hence per cell: n_vecs -> K·n_vecs,
    n_dropped -> n_dropped + (K-1)·n_vecs, n_kept unchanged.

    Precondition: every base vector has nonzero norm (a zero-norm
    vector's copies never drop and its NaN cell assignment is
    engine-dependent) — guarded by poisoning n_vecs with -1.
    """
    return f"""
WITH p AS (SELECT (max(vec_id)+1)//{k} AS off FROM embeddings),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < (SELECT off FROM p)),
guard AS (SELECT min(list_dot_product(v, v)) AS min_nn FROM e),
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
         AS FLOAT) >= {threshold}),
base AS (
  SELECT a.cell,
         count(*) AS n_vecs,
         count(d.vec_id) AS n_dropped,
         count(*) - count(d.vec_id) AS n_kept
  FROM assign a LEFT JOIN dropped d ON a.cell = d.cell AND a.vec_id = d.vec_id
  GROUP BY a.cell)
SELECT cell,
       CAST(CASE WHEN (SELECT min_nn FROM guard) > 0
            THEN {k} * n_vecs ELSE -1 END AS BIGINT) AS n_vecs,
       CAST(n_dropped + {k - 1} * n_vecs AS BIGINT) AS n_dropped,
       CAST(n_kept AS BIGINT) AS n_kept
FROM base
ORDER BY cell
"""

