"""Raster-tile enrichment dataflow (SURVEY.md §3 E1) — the reference's
signature pipeline (`/root/reference/update_ways_metadata.py:12-35`)
re-expressed as one lazy DataFrame plan:

    ways(gid, geom)
      → posexplode vertices                      (P4)
      → Web-Mercator + tile/pixel, native math   (P5, P6 — no UDF)
      → distinct tiles → materialize → join back (S2/S3/J2: the dict
        cache becomes dedup + broadcast join — pure dataflow)
      → per-tile vectorized pixel sampling       (P7/P9: applyInPandas,
        decode each tile ONCE, numpy-sample all its coordinates — the
        reference decodes once but samples scalar-ly)
      → exact median per way                     (A1: percentile, not
        approx — np.median parity)
      → global max → broadcast-normalize         (A2/A3: crossJoin of a
        1-row aggregate, no single-partition window)

Boundaries that were process hops in the reference (DB cursor, HTTP,
dict) are shuffles here; the only Python is the Arrow-batched pixel
sampler, which is O(distinct tiles) not O(vertices).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import lnglat_to_tile_pixel
from ..sources.tiles import decode_tile, synthetic_tiles


@dataclass
class Provider:
    """The reference's CachedTiledDataProvider as plan configuration
    (`dataproviders.py:59-69`): URL/template is replaced by a
    tile-materialization function; value_fn by a named vectorized
    sampler (U1/U2 extension point)."""

    name: str
    mode: str  # 'L' | 'RGB'
    zoom: int = 12
    tile_size: int = 256
    value_kind: str = "gray"  # 'gray' | 'greenery_abs' | 'greenery_rel'
    tile_source: Callable[[SparkSession, DataFrame], DataFrame] | None = None
    extra: dict = field(default_factory=dict)


STRAVA_PROVIDER = Provider(name="strava_popularity", mode="L", zoom=12, value_kind="gray")
STRAVA_HIGHRES_PROVIDER = Provider(
    # defined-but-not-wired in the reference (update_ways_metadata.py:138)
    name="strava_popularity_highres", mode="L", zoom=15, tile_size=512, value_kind="gray"
)
GMAPS_GREENERY_PROVIDER = Provider(
    name="gmaps_greenery", mode="RGB", zoom=15, value_kind="greenery_abs"
)


def _box_sums(plane: np.ndarray, x0, x1, y0, y1) -> np.ndarray:
    """Sum of ``plane`` over each [y0:y1, x0:x1] box via one integral
    image (exact int64 math — bitwise-identical to crop.sum()): the
    per-sample cost is 4 lookups instead of a 21×21 crop reduction."""
    ii = np.zeros((plane.shape[0] + 1, plane.shape[1] + 1), dtype=np.int64)
    np.cumsum(np.cumsum(plane, axis=0, dtype=np.int64), axis=1, out=ii[1:, 1:])
    return ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]


def _sample_values(
    pixels: pd.DataFrame, tile: pd.DataFrame, value_kind: str, tile_size: int, mode: str
) -> pd.DataFrame:
    """Vectorized per-tile sampler (cogrouped): ``pixels`` holds the
    DISTINCT (px,py) of ONE tile; ``tile`` holds that tile's single row
    (or is empty if the fetch failed → NaN, P11)."""
    img_bytes = tile["img"].iloc[0] if len(tile) else None
    px = pixels["px"].to_numpy()
    py = pixels["py"].to_numpy()
    if img_bytes is None:
        vals = np.full(len(pixels), np.nan)
    else:
        arr = decode_tile(bytes(img_bytes), mode, tile_size)
        if value_kind == "gray":
            # reference strava_value: img.getpixel((x,y))/255
            # (update_ways_metadata.py:64-65)
            vals = arr[py, px].astype(np.float64) / 255.0
        elif value_kind in ("greenery_abs", "greenery_rel"):
            # reference greenery_value_absolute (update_ways_metadata.py:109-118):
            # 21x21 crop clipped to tile edges, reduced to a mean. A
            # crop mean is a box sum / area, so the whole batch rides
            # integral images (one cumsum per needed plane per tile)
            # instead of a Python loop over samples — O(tile + samples)
            # not O(samples × 441), exact int64 → same float64 results.
            x0, y0 = np.maximum(0, px - 10), np.maximum(0, py - 10)
            x1 = np.minimum(tile_size, px + 10)
            y1 = np.minimum(tile_size, py + 10)
            area = ((x1 - x0) * (y1 - y0)).astype(np.float64)
            a64 = arr.astype(np.int64)
            r, g, b = a64[..., 0], a64[..., 1], a64[..., 2]
            if value_kind == "greenery_abs":
                # fraction of green-dominant px: clip(min(g-r,g-b),0,1)
                ind = np.clip(np.minimum(g - r, g - b), 0, 1)
                vals = _box_sums(ind, x0, x1, y0, y1) / area
            else:
                # greenery_value_relative — defined but UNWIRED in the
                # reference (update_ways_metadata.py:102-107,
                # PyUnusedLocal); mirrored with mean-pool as the 1px
                # resize: per-channel crop means via 3 integral images.
                mr = _box_sums(r, x0, x1, y0, y1) / area
                mg = _box_sums(g, x0, x1, y0, y1) / area
                mb = _box_sums(b, x0, x1, y0, y1) / area
                vals = np.minimum(
                    1.0, np.maximum(mg - np.maximum(mr, mb), 0.0) / 200.0
                )
        else:
            raise ValueError(f"unknown value_kind {value_kind}")
    out = pixels[["z", "x", "y", "px", "py"]].copy()
    out["value"] = vals
    return out


def explode_way_coords(ways: DataFrame) -> DataFrame:
    """ways(gid, geom) → one (gid, lng, lat) row per vertex. Zoom- and
    provider-independent, so a multi-provider pipeline can materialize
    it ONCE and share it across every enrichment pass (the reference
    walks the ways cursor once per provider; see update_ways_metadata
    .run's one-pass loop)."""
    return ways.select("gid", F.posexplode("geom").alias("pos", "pt")).select(
        "gid", F.col("pt.lng").alias("lng"), F.col("pt.lat").alias("lat")
    )


def sample_tile_values(
    spark: SparkSession,
    ways: DataFrame,
    provider: Provider,
    coords: DataFrame | None = None,
) -> DataFrame:
    """ways(gid, geom) → (gid, value) one row per vertex. ``coords``:
    an optional pre-exploded (gid, lng, lat) frame (explode_way_coords)
    — pass a persisted one to share the explode across providers; the
    output is identical either way."""
    if coords is None:
        coords = explode_way_coords(ways)
    tx, ty, px, py = lnglat_to_tile_pixel("lng", "lat", provider.zoom, provider.tile_size)
    keyed = coords.select(
        "gid",
        F.lit(provider.zoom).cast("int").alias("z"),
        tx.alias("x"),
        ty.alias("y"),
        px.cast("int").alias("px"),
        py.cast("int").alias("py"),
    )
    tile_source = provider.tile_source or (
        lambda sp, needed: synthetic_tiles(sp, needed, provider.mode, provider.tile_size)
    )
    tiles = tile_source(spark, keyed)
    # A pixel's value depends only on (z,x,y,px,py) — so the Python
    # sampling stage runs over DISTINCT pixels (≤ tile_size² per tile,
    # independent of vertex count: the scale-invariant. At 100 TB the
    # vertex frame grows; this stage doesn't). Cogrouped applyInPandas
    # pairs each tile's pixel group with its single tile row, so image
    # bytes are never replicated per coordinate and never shuffled more
    # than once.
    pixels = keyed.select("z", "x", "y", "px", "py").dropDuplicates()
    sampled_px = (
        pixels.groupBy("z", "x", "y")
        .cogroup(tiles.groupBy("z", "x", "y"))
        .applyInPandas(
            lambda pix, tile: _sample_values(
                pix, tile, provider.value_kind, provider.tile_size, provider.mode
            ),
            schema="z int, x long, y long, px int, py int, value double",
        )
    )
    # Join the small value frame back to per-vertex rows. AQE turns
    # this into a broadcast join at region scale (values ≤ 65k/tile);
    # at continental scale it stays a well-distributed shuffle join on
    # the 5-part pixel key.
    return keyed.join(sampled_px, ["z", "x", "y", "px", "py"], "left").select(
        "gid", "value"
    )


def enrich_ways(
    spark: SparkSession,
    ways: DataFrame,
    provider: Provider,
    coords: DataFrame | None = None,
) -> DataFrame:
    """Full E1: per-way exact median of sampled values, normalized by
    the global max median (update_ways_metadata.py:29-33). Returns
    (gid, <provider.name>) with values in [0,1]. ``coords`` as in
    sample_tile_values."""
    sampled = sample_tile_values(spark, ways, provider, coords=coords)
    # NOTE: the static plan shows the gmax broadcast side repeating the
    # whole sampling subtree, but runtime ReuseExchange/ReuseSubquery
    # dedupes the identical shuffle stages — measured FASTER than an
    # explicit persist of the median frame, which breaks exchange reuse
    # and pays a cache materialization (2.7s vs 8-17s at sf0.1).
    medians = sampled.groupBy("gid").agg(F.median("value").alias("median_value"))
    gmax = medians.agg(F.max("median_value").alias("gmax"))
    return medians.crossJoin(F.broadcast(gmax)).select(
        "gid",
        # All-zero tiles → 0/0: the reference's numpy yields NaN; ANSI
        # mode (Spark 4 default) would throw DIVIDE_BY_ZERO instead, so
        # the NaN branch is explicit (documented edge case, FIXTURES.md,
        # pinned in test_enrichment).
        F.when(
            F.col("gmax") != 0, F.col("median_value") / F.col("gmax")
        )
        .otherwise(F.lit(float("nan")))
        .alias(provider.name),
    )
