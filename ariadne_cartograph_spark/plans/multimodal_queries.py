r"""Multimodal catalog entries (north-star "multimodal columns") over
the deterministic media table synthesized from `documents`
(operators/multimodal.py).

Each query's DuckDB oracle recomputes the identical statistics straight
from the document text bytes (payload = UTF-8 of ASCII text, so
``ascii(substring(text, i, 1))`` IS byte i) — a full value-hash gate on
the mapInPandas plumbing, not a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal as M
from ..sources.tables import load_table
from .catalog import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_from_documents(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_image_stats",
    headline=True,  # fences the Arrow mapInPandas machinery (r4 advice)
    tags=["U3"],
    oracle="""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(floor(sqrt(CAST(n_chars AS DOUBLE))) AS INT) AS side,
         text
  FROM documents WHERE doc_id % 3 = 0),
px AS (
  SELECT media_id, side,
         list_transform(range(1, side*side + 1),
                        i -> ascii(substring(text, CAST(i AS INT), 1))) AS v
  FROM m)
SELECT media_id,
       side AS width,
       side AS height,
       CAST(list_sum(v) AS DOUBLE) / (side*side) AS mean_px,
       CAST(list_min(v) AS INT) AS min_px,
       CAST(list_max(v) AS INT) AS max_px
FROM px
ORDER BY media_id
""",
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_features(_media(spark, sf_dir)).orderBy("media_id")


@register(
    "multimodal_frame_means",
    tags=["U3"],
    oracle="""
WITH v AS (
  SELECT doc_id AS media_id, text,
         CAST(floor(n_chars / 16) AS INT) AS n_frames
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT media_id, CAST(unnest(range(0, n_frames, 4)) AS INT) AS frame_idx, text
  FROM v)
SELECT media_id, frame_idx,
       CAST(list_sum(list_transform(range(1, 17),
              i -> ascii(substring(text, frame_idx*16 + CAST(i AS INT), 1)))) AS DOUBLE)
         / 16 AS frame_mean
FROM f
ORDER BY media_id, frame_idx
""",
)
def multimodal_frame_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        M.sample_frames(_media(spark, sf_dir), stride=4)
        .select("media_id", "frame_idx", "frame_mean")
        .orderBy("media_id", "frame_idx")
    )


@register(
    "multimodal_audio_stats",
    tags=["U3"],
    oracle="""
WITH a AS (
  SELECT doc_id AS media_id, text, n_chars
  FROM documents WHERE doc_id % 3 = 1),
s AS (
  SELECT media_id, n_chars,
         list_transform(range(1, CAST(n_chars AS INT) + 1),
                        i -> ascii(substring(text, CAST(i AS INT), 1))) AS v
  FROM a)
SELECT media_id,
       n_chars AS n_samples,
       CAST(n_chars AS DOUBLE) / 8000 AS duration_s,
       sqrt(CAST(list_sum(list_transform(v, x -> x*x)) AS DOUBLE) / n_chars) AS rms,
       CAST(list_max(v) AS INT) AS peak
FROM s
ORDER BY media_id
""",
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.audio_features(_media(spark, sf_dir)).orderBy("media_id")


@register(
    "multimodal_resize_pipeline",
    tags=["U3"],
    oracle="""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(floor(sqrt(CAST(n_chars AS DOUBLE))) AS INT) AS side,
         text
  FROM documents WHERE doc_id % 3 = 0),
px AS (
  -- nearest-neighbor sample grid: src index = (dst * src_dim) // 8,
  -- flat offset = y*side + x (row-major), +1 for 1-based substring
  SELECT media_id,
         list_transform(range(0, 64),
            k -> ascii(substring(text,
                 CAST(((k // 8) * side // 8) * side
                      + ((k % 8) * side // 8) + 1 AS INT), 1))) AS v
  FROM m)
SELECT media_id,
       8 AS width,
       8 AS height,
       CAST(list_sum(v) AS DOUBLE) / 64 AS mean_px,
       CAST(list_min(v) AS INT) AS min_px,
       CAST(list_max(v) AS INT) AS max_px
FROM px
ORDER BY media_id
""",
)
def multimodal_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → NN-resize(8×8) → re-extract features: the shrink-early
    pipeline shape. The oracle replays the exact nearest-neighbor
    sample grid ((dst*src)//out index math) over the same payload
    bytes, so the resize + re-decode plumbing is value-hash checked
    end-to-end; the numpy twin in tests/test_multimodal.py pins the
    same math against an independent implementation."""
    resized = M.resize_media(_media(spark, sf_dir), out_w=8, out_h=8)
    return M.image_features(resized).orderBy("media_id")
