"""Spatial distance/range join + POI nearest-edge assignment
(SURVEY.md §2.2 J4) — the engine's analog of pgRouting's
`osm2pgr_pois_update(radius, within)` (`/root/reference/README.md:50-54`).

Strategy (SURVEY.md §4.2 — no custom Catalyst strategy needed):
grid-bucket both sides with cell size = radius, explode the 3×3
neighbor ring on the POI side, equi-join on cell, exact point-to-
segment distance filter, then top-1 per POI via a ranking window.
Compiles to a standard shuffled hash join + window — at 100 TB the
cell id is the shuffle key and density skew is handled by AQE.

Distance math: local equirectangular projection (meters) around each
POI — exact enough at the ≤ a-few-hundred-meters scales this operator
is specified for (within=50m default), and fully expressible as native
column math over the segment list (no UDF).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.geo import grid_cell, neighbor_cells

_DEG_M = 111194.9  # meters per degree latitude (2πR/360, R=6371008.8)


def _point_segment_dist_m(plng, plat, alng, alat, blng, blat):
    """Planar point-to-segment distance in meters (equirectangular
    local frame centered at the point's latitude)."""
    kx = F.cos(plat * math.pi / 180.0) * _DEG_M
    ky = F.lit(_DEG_M)
    ax = (alng - plng) * kx
    ay = (alat - plat) * ky
    bx = (blng - plng) * kx
    by = (blat - plat) * ky
    dx = bx - ax
    dy = by - ay
    seg_len2 = dx * dx + dy * dy
    t = F.when(seg_len2 > 0, -(ax * dx + ay * dy) / seg_len2).otherwise(F.lit(0.0))
    t = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
    cx = ax + t * dx
    cy = ay + t * dy
    return F.sqrt(cx * cx + cy * cy)


def point_to_linestring_dist_m(plng: F.Column, plat: F.Column, geom: F.Column) -> F.Column:
    """Min distance (m) from a point to a linestring
    (array<struct<lng,lat>>), via per-segment distances."""
    segs = F.zip_with(
        F.slice(geom, 1, F.size(geom) - 1),
        F.slice(geom, 2, F.size(geom) - 1),
        lambda a, b: _point_segment_dist_m(
            plng, plat, a["lng"], a["lat"], b["lng"], b["lat"]
        ),
    )
    return F.when(F.size(geom) >= 2, F.array_min(segs)).otherwise(
        _point_segment_dist_m(
            plng, plat, geom[0]["lng"], geom[0]["lat"], geom[0]["lng"], geom[0]["lat"]
        )
    )


def assign_pois_to_edges(
    pois: DataFrame,
    edges: DataFrame,
    radius_m: float = 200.0,
    within_m: float = 50.0,
    poi_id: str = "pid",
    lng: str = "lng",
    lat: str = "lat",
    max_abs_lat: float | None = None,
) -> DataFrame:
    """For each POI: nearest edge within ``within_m`` (ties → lowest
    gid); POIs with no edge inside the radius disk are flagged
    too_far (README.md:54 semantics). Returns one row per POI:
    (pid, gid|null, dist_m|null, too_far).

    ``max_abs_lat`` bounds the data's latitude range for cell sizing
    (None → one aggregation over the POI side, the small side by
    construction). A cell spans cell_deg·_DEG_M·cos(lat) meters
    east-west — NARROWER than its north-south extent — so sizing by
    the latitude degree alone under-covers longitude once
    within_m > radius_m·cos(lat) (≈75.5° at the 50/200 defaults);
    dividing by cos(max|lat|) keeps the 3×3 neighbor ring a superset
    of the within_m disk at every latitude in the data.
    """
    if max_abs_lat is None:
        row = pois.agg(F.max(F.abs(F.col(lat)))).first()
        max_abs_lat = float(row[0] or 0.0)
    max_abs_lat = min(abs(max_abs_lat), 89.0)  # pole guard: cos > 0
    cell_deg = radius_m / (_DEG_M * math.cos(max_abs_lat * math.pi / 180.0))
    e_cx, e_cy = grid_cell(
        F.element_at(F.col("geom"), 1)["lng"], F.element_at(F.col("geom"), 1)["lat"], cell_deg
    )
    # Edge side: bucket every edge into each cell its bbox touches so
    # long edges are discoverable from any neighboring POI cell.
    from ..functions.geometry import bbox

    eb = edges.withColumn("__bb", bbox("geom"))
    eb = eb.select(
        "gid",
        "geom",
        F.explode(
            F.expr(
                f"""
                flatten(transform(
                  sequence(cast(floor(__bb.min_lng / {cell_deg}) as long),
                           cast(floor(__bb.max_lng / {cell_deg}) as long)),
                  x -> transform(
                    sequence(cast(floor(__bb.min_lat / {cell_deg}) as long),
                             cast(floor(__bb.max_lat / {cell_deg}) as long)),
                    y -> struct(x as cx, y as cy))))
                """
            )
        ).alias("cell"),
    ).select("gid", "geom", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))

    p_cx, p_cy = grid_cell(F.col(lng), F.col(lat), cell_deg)
    pb = pois.select(
        F.col(poi_id), F.col(lng), F.col(lat), F.explode(neighbor_cells(p_cx, p_cy)).alias("cell")
    ).select(poi_id, lng, lat, F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))

    cand = pb.join(eb, ["cx", "cy"]).withColumn(
        "dist_m", point_to_linestring_dist_m(F.col(lng), F.col(lat), F.col("geom"))
    )
    near = cand.filter(F.col("dist_m") <= within_m)
    w = W.partitionBy(poi_id).orderBy(F.asc("dist_m"), F.asc("gid"))
    best = (
        near.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(poi_id, "gid", "dist_m")
    )
    return (
        pois.select(poi_id, lng, lat)
        .join(best, poi_id, "left")
        .withColumn("too_far", F.col("gid").isNull())
    )


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "pid",
    lng: str = "lng",
    lat: str = "lat",
    poly_id: str = "poly_id",
) -> DataFrame:
    """Spatial containment join (PostGIS ``ST_Contains`` analog over
    the planet_osm_polygon shape): one row per (point, containing
    polygon). ``polygons`` carries (poly_id, geom = outer ring,
    holes = array of hole rings, nullable).

    Plan: broadcast the polygon side (zone/region tables are
    dimension-sized; for a billion-polygon side, swap the broadcast for
    the grid-cell bucketing of :func:`assign_pois_to_edges` — same
    candidate structure, PIP instead of distance). A bbox prefilter
    runs BEFORE the exact ray-crossing test so the per-pair cost for
    the overwhelmingly-common miss is four comparisons, not an edge
    scan; both stages are pure column math inside whole-stage codegen."""
    from ..functions.geometry import bbox, point_in_polygon

    polys = F.broadcast(
        polygons.select(
            F.col(poly_id),
            F.col("geom").alias("__geom"),
            F.col("holes").alias("__holes"),
            bbox("geom").alias("__bb"),
        )
    )
    plng, plat = F.col(lng), F.col(lat)
    return (
        points.crossJoin(polys)
        .filter(
            (plng >= F.col("__bb.min_lng"))
            & (plng <= F.col("__bb.max_lng"))
            & (plat >= F.col("__bb.min_lat"))
            & (plat <= F.col("__bb.max_lat"))
        )
        .filter(point_in_polygon(plng, plat, F.col("__geom"), F.col("__holes")))
        .drop("__geom", "__holes", "__bb")
    )
