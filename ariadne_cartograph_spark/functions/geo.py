"""Geospatial column functions (SURVEY.md §2.3 P5/P6 + spatial-join
support): Web-Mercator projection and XYZ tile/pixel math as native
Column expression trees — the reference computes these per-coordinate
in Python (/root/reference/dataproviders.py:25-56); here they are
whole-stage-codegen'd JVM expressions, no UDF.

Determinism note: `sin`/`log` are transcendental — JVM vs C libm can
differ in the last ulp, so oracle-checked outputs derived from these
are compared at float32 (see plans/geo_queries.py). Pure arithmetic
(multiply/divide/floor) is IEEE-exact and engine-identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def project_4326_to_3857(
    lng: Column | str, lat: Column | str, tile_size: int = 256
) -> tuple[Column, Column]:
    """EPSG:4326 → EPSG:3857 world coordinates in "degree units"
    (world spans [0, tile_size)): same formulas as the reference
    (`dataproviders.py:34-39`), incl. the ±0.9999 siny clamp
    (≙ |lat| ≤ 89.189°)."""
    lng_c = F.col(lng) if isinstance(lng, str) else lng
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    siny = F.sin(lat_c * math.pi / 180.0)
    siny = F.least(F.greatest(siny, F.lit(-0.9999)), F.lit(0.9999))
    wx = tile_size * (0.5 + lng_c / 360.0)
    wy = tile_size * (0.5 - F.log((1 + siny) / (1 - siny)) / (4 * math.pi))
    return wx, wy


def world_to_tile_pixel(
    w: Column, zoom: int, tile_size: int = 256
) -> tuple[Column, Column]:
    """One world axis → (tile index, pixel within tile) at ``zoom``
    (`dataproviders.py:51-56`). scale = 1 << zoom.

    pmod, not `%`: the reference uses Python modulo, which is always
    non-negative; Spark's `%` is a remainder (sign of the dividend) and
    would emit negative pixels for the out-of-domain world coords that
    clamped latitudes (|lat| > 85.05°) produce — caught by
    test_geo_properties."""
    scale = 1 << zoom
    scaled = w * F.lit(float(scale))
    pixel = F.floor(F.pmod(scaled, F.lit(float(tile_size)))).cast("long")
    tile = F.floor(scaled / tile_size).cast("long")
    return tile, pixel


def lnglat_to_tile_pixel(
    lng: Column | str, lat: Column | str, zoom: int, tile_size: int = 256
) -> tuple[Column, Column, Column, Column]:
    """(lng, lat) → (tile_x, tile_y, px, py) — the full reference
    pipeline `project_4326_to_3857` ∘ `convert_3857_to_xyz`."""
    wx, wy = project_4326_to_3857(lng, lat, tile_size)
    tx, px = world_to_tile_pixel(wx, zoom, tile_size)
    ty, py = world_to_tile_pixel(wy, zoom, tile_size)
    return tx, ty, px, py


EARTH_RADIUS_M = 6371008.8  # IUGG mean radius


def haversine_m(
    lng1: Column, lat1: Column, lng2: Column, lat2: Column
) -> Column:
    """Great-circle distance in meters (haversine, spherical earth)."""
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad
    dlng = (lng2 - lng1) * rad
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlng / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def grid_cell(
    lng: Column | str, lat: Column | str, cell_deg: float
) -> tuple[Column, Column]:
    """Spatial grid bucket ids for cell-join strategies (SURVEY.md J4).
    Pure IEEE arithmetic → deterministic across engines."""
    lng_c = F.col(lng) if isinstance(lng, str) else lng
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    return (
        F.floor(lng_c / F.lit(cell_deg)).cast("long"),
        F.floor(lat_c / F.lit(cell_deg)).cast("long"),
    )


def neighbor_cells(cx: Column, cy: Column) -> Column:
    """The 3×3 neighborhood of a grid cell as array<struct<cx,cy>> —
    explode this on the smaller join side so a single-cell equi-join
    catches all pairs within one cell width."""
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    return F.array(
        *[
            F.struct((cx + dx).alias("cx"), (cy + dy).alias("cy"))
            for dx, dy in offsets
        ]
    )
