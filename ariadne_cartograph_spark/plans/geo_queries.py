"""GIS operator catalog entries (SURVEY.md §2.3 P5/P6, §3 E1, §2.2 J4).

Two flavors:

- **Oracle-checked** queries derive deterministic coordinates from the
  driver testdata (pure IEEE arithmetic — engine-identical) and check
  the projection/tile/enrichment math against DuckDB computing the
  same closed forms analytically. The flagship
  ``ways_enrichment_pipeline`` runs the ENTIRE reference dataflow
  (explode → project → distinct-tile join → binary-tile pixel sampling
  in applyInPandas → exact median → broadcast normalize) while the
  oracle recomputes pixel values symbolically — an end-to-end
  cross-engine check of E1.
- **Rows-only** queries exercise the OSM ingest / topology / POI
  pipelines on the reference's own fixture (no OSM tables exist in the
  oracle's view set); their golden checks live in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import grid_cell, haversine_m, lnglat_to_tile_pixel, project_4326_to_3857
from ..sources.tables import load_table
from .catalog import register

# Shared synthetic coordinate derivation (documented once, used by both
# engines): events → world lng/lat; lineitem → bbox-local ways.
_EV_LNG = "value - 180.0"
_EV_LAT = "CASE WHEN event_id % 97 = 0 THEN 89.5 ELSE (value % 160.0) - 80.0 END"


@register(
    "geo_tile_projection",
    tags=["P5", "P6"],
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_EV_LNG} AS lng, {_EV_LAT} AS lat FROM events),
proj AS (
  SELECT event_id, lng, lat,
         256 * (0.5 + lng / 360) AS wx,
         256 * (0.5 - ln((1 + least(greatest(sin(lat * pi() / 180), -0.9999), 0.9999))
                       / (1 - least(greatest(sin(lat * pi() / 180), -0.9999), 0.9999)))
                 / (4 * pi())) AS wy
  FROM pts)
SELECT event_id,
       CAST(wx AS FLOAT) AS wx_f, CAST(wy AS FLOAT) AS wy_f,
       CAST(floor(wx * 4096 / 256) AS BIGINT) AS tile_x,
       CAST(floor(wy * 4096 / 256) AS BIGINT) AS tile_y,
       -- python-modulo (always >= 0), not remainder: matches the
       -- reference's `w * scale % T` and the engine's pmod
       CAST(floor(((wx * 4096 % 256) + 256) % 256) AS BIGINT) AS px,
       CAST(floor(((wy * 4096 % 256) + 256) % 256) AS BIGINT) AS py
FROM proj
ORDER BY event_id
""",
)
def geo_tile_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P6 on testdata-derived world coordinates (incl. the ±89.189°
    clamp branch via the 89.5° rows)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.expr(_EV_LNG).alias("lng"),
        F.expr(_EV_LAT).alias("lat"),
    )
    wx, wy = project_4326_to_3857("lng", "lat")
    tx, ty, px, py = lnglat_to_tile_pixel("lng", "lat", zoom=12)
    return pts.select(
        "event_id",
        wx.cast("float").alias("wx_f"),
        wy.cast("float").alias("wy_f"),
        tx.alias("tile_x"),
        ty.alias("tile_y"),
        px.alias("px"),
        py.alias("py"),
    ).orderBy("event_id")


@register(
    "geo_haversine_user_path",
    tags=["P14", "W3"],
    oracle=f"""
WITH pts AS (
  SELECT user_id, ts, event_id, {_EV_LNG} AS lng, {_EV_LAT} AS lat FROM events),
hops AS (
  SELECT user_id,
         lng, lat,
         lag(lng) OVER w AS plng, lag(lat) OVER w AS plat
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       count(plng) AS n_hops,
       CAST(sum(2 * 6371008.8 * asin(sqrt(
           sin((lat - plat) * pi() / 180 / 2) ^ 2
           + cos(plat * pi() / 180) * cos(lat * pi() / 180)
             * sin((lng - plng) * pi() / 180 / 2) ^ 2))) AS FLOAT) AS path_m
FROM hops
GROUP BY user_id
ORDER BY user_id
""",
)
def geo_haversine_user_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", "ts", "event_id", F.expr(_EV_LNG).alias("lng"), F.expr(_EV_LAT).alias("lat")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hops = pts.select(
        "user_id",
        "lng",
        "lat",
        F.lag("lng").over(w).alias("plng"),
        F.lag("lat").over(w).alias("plat"),
    )
    return (
        hops.groupBy("user_id")
        .agg(
            F.count("plng").alias("n_hops"),
            F.sum(haversine_m(F.col("plng"), F.col("plat"), F.col("lng"), F.col("lat")))
            .cast("float")
            .alias("path_m"),
        )
        .orderBy("user_id")
    )


@register(
    "geo_grid_cell_density",
    tags=["J4", "A5"],
    oracle=f"""
WITH pts AS (SELECT {_EV_LNG} AS lng, {_EV_LAT} AS lat, value FROM events)
SELECT CAST(floor(lng / 0.0625) AS BIGINT) AS cx,
       CAST(floor(lat / 0.0625) AS BIGINT) AS cy,
       count(*) AS n, round(sum(value), 2) AS total
FROM pts
GROUP BY 1, 2
ORDER BY cx, cy
""",
)
def geo_grid_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(F.expr(_EV_LNG).alias("lng"), F.expr(_EV_LAT).alias("lat"), "value")
    cx, cy = grid_cell("lng", "lat", 0.0625)
    return (
        pts.groupBy(cx.alias("cx"), cy.alias("cy"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("cx", "cy")
    )


# --------------------------------------------------------------------------
# Flagship: end-to-end enrichment (E1) on SF-scaled synthetic ways.
# --------------------------------------------------------------------------

# lineitem → ways inside the reference fixture's bbox: lng/lat from
# price/quantity (pure IEEE arithmetic), vertex order = l_linenumber.
_LI_LNG = "-118.13 + (l_extendedprice % 1400.0) / 100000.0"
_LI_LAT = "34.1348 + ((l_quantity * 171.0) % 800.0) / 100000.0"


def ways_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_orderkey").alias("gid"),
        F.col("l_linenumber").alias("pos"),
        F.expr(_LI_LNG).alias("lng"),
        F.expr(_LI_LAT).alias("lat"),
    )
    return pts.groupBy("gid").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "pos",
                        F.struct(F.col("lng"), F.col("lat")).alias("pt"),
                    )
                )
            ),
            lambda s: s["pt"],
        ).alias("geom")
    )


@register(
    "ways_enrichment_pipeline",
    headline=True,
    tags=["E1", "S2", "S3", "J2", "P4", "P5", "P6", "P7", "A1", "A2", "A3"],
    oracle=f"""
WITH pts AS (
  SELECT l_orderkey AS gid,
         {_LI_LNG} AS lng,
         {_LI_LAT} AS lat
  FROM lineitem),
proj AS (
  SELECT gid,
         256 * (0.5 + lng / 360) AS wx,
         256 * (0.5 - ln((1 + least(greatest(sin(lat * pi() / 180), -0.9999), 0.9999))
                       / (1 - least(greatest(sin(lat * pi() / 180), -0.9999), 0.9999)))
                 / (4 * pi())) AS wy
  FROM pts),
px AS (
  SELECT gid,
         CAST(floor(wx * 4096 / 256) AS BIGINT) AS x,
         CAST(floor(wy * 4096 / 256) AS BIGINT) AS y,
         CAST(floor(wx * 4096 % 256) AS BIGINT) AS px,
         CAST(floor(wy * 4096 % 256) AS BIGINT) AS py
  FROM proj),
vals AS (
  SELECT gid, CAST((px + py + x + y + 12) % 256 AS DOUBLE) / 255 AS v FROM px),
med AS (SELECT gid, median(v) AS med FROM vals GROUP BY gid),
gmax AS (SELECT max(med) AS gmax FROM med)
SELECT gid,
       CAST(med AS FLOAT) AS median_value,
       CAST(med / gmax AS FLOAT) AS popularity
FROM med, gmax
ORDER BY gid
""",
)
def ways_enrichment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole E1 dataflow, SF-scaled: Spark runs the
    real thing (binary tiles, pandas sampler, median, normalize); the
    oracle recomputes pixel values analytically from the closed-form
    synthetic tile definition."""
    from ..operators.enrich import STRAVA_PROVIDER, enrich_ways, sample_tile_values

    ways = ways_from_lineitem(spark, sf_dir)
    sampled = sample_tile_values(spark, ways, STRAVA_PROVIDER)
    # no persist: runtime exchange reuse dedupes the shared subtree
    # under gmax (see operators/enrich.py:enrich_ways note)
    med = sampled.groupBy("gid").agg(F.median("value").alias("med"))
    gmax = med.agg(F.max("med").alias("gmax"))
    return (
        med.crossJoin(F.broadcast(gmax))
        .select(
            "gid",
            F.col("med").cast("float").alias("median_value"),
            (F.col("med") / F.col("gmax")).cast("float").alias("popularity"),
        )
        .orderBy("gid")
    )


# --------------------------------------------------------------------------
# Rows-only: OSM ingest / topology / POI pipelines on the reference
# fixture (golden-checked in tests/, no OSM tables in the oracle views).
# --------------------------------------------------------------------------

_OSM_PATH = "/root/reference/osm/example.osm"


@register("osm_ingest_feature_tables", tags=["S6", "P12", "P13"])
def osm_ingest_feature_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.osm import (
        assemble_way_geometries,
        derive_feature_tables,
        read_osm_elements,
        split_elements,
    )

    t = split_elements(read_osm_elements(spark, _OSM_PATH))
    geo = assemble_way_geometries(t["nodes"], t["ways"])
    tables = derive_feature_tables(t["nodes"], geo)
    stats = None
    for name, df in tables.items():
        row = df.groupBy(F.lit(name).alias("table_name")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        stats = row if stats is None else stats.unionByName(row)
    return stats.orderBy("table_name")


@register("osm_topology_edges", tags=["S8"])
def osm_topology_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topology import build_topology, routable_ways
    from ..sources.osm import read_osm_elements, split_elements

    t = split_elements(read_osm_elements(spark, _OSM_PATH))
    edges = build_topology(t["nodes"], routable_ways(t["ways"]))["edges"]
    return edges.select("gid", "osm_way_id", "source", "target", F.size("geom").alias("n_vertices")).orderBy("gid")


@register("osm_poi_nearest_edge", tags=["J4", "W1"])
def osm_poi_nearest_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import assign_pois_to_edges
    from ..operators.topology import build_topology, routable_ways
    from ..sources.osm import read_osm_elements, split_elements

    t = split_elements(read_osm_elements(spark, _OSM_PATH))
    nodes = t["nodes"]
    edges = build_topology(nodes, routable_ways(t["ways"]))["edges"]
    # POIs = the fixture's tagged amenity nodes (real data)
    pois = nodes.filter(F.col("tags").getItem("amenity").isNotNull()).select(
        F.col("id").alias("pid"), F.col("lon").alias("lng"), F.col("lat")
    )
    return assign_pois_to_edges(pois, edges).orderBy("pid")


@register("osm_ways_enrichment_fixture", tags=["E1"])
def osm_ways_enrichment_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.enrich import GMAPS_GREENERY_PROVIDER, enrich_ways
    from ..sources.osm import assemble_way_geometries, read_osm_elements, split_elements

    t = split_elements(read_osm_elements(spark, _OSM_PATH))
    geo = assemble_way_geometries(t["nodes"], t["ways"])
    ways = geo.filter(F.col("tags").getItem("highway").isNotNull()).select(
        F.col("id").alias("gid"), "geom"
    )
    return enrich_ways(spark, ways, GMAPS_GREENERY_PROVIDER).orderBy("gid")


@register(
    "trajectory_jaccard_pairs",
    tags=["U4"],
    oracle=f"""
WITH pts AS (
  SELECT user_id,
         CAST(floor(({_EV_LNG}) / 10.0) AS BIGINT) * 1000000
         + CAST(floor(({_EV_LAT}) / 10.0) AS BIGINT) AS cell
  FROM events),
c AS (SELECT DISTINCT user_id, cell FROM pts),
sizes AS (SELECT user_id, count(*) AS n FROM c GROUP BY user_id),
inter AS (
  SELECT a.user_id AS id_a, b.user_id AS id_b, count(*) AS ni
  FROM c a JOIN c b ON a.cell = b.cell AND a.user_id < b.user_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard
FROM inter JOIN sizes sa ON sa.user_id = id_a JOIN sizes sb ON sb.user_id = id_b
WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.6
ORDER BY id_a, id_b
""",
)
def trajectory_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity via grid-cell signature sets (PAPERS.md
    REPOSE pattern; operators/trajectory.py) on the events-derived
    world coordinates — cell math is pure integer arithmetic, so the
    full pipeline is value-hash checked."""
    from ..operators.trajectory import trajectory_jaccard_pairs

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", F.expr(_EV_LNG).alias("lng"), F.expr(_EV_LAT).alias("lat")
    )
    return trajectory_jaccard_pairs(
        pts, "user_id", "lng", "lat", cell_deg=10.0, threshold=0.6
    ).orderBy("id_a", "id_b")


@register("trajectory_topk_similar", tags=["U4", "W4"])
def trajectory_topk_similar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k similar trajectories for a fixed query set (rows-only:
    top-k rank ties at equal jaccard are broken by id deterministically,
    but the windowed form is cheaper to keep rows-only; pair semantics
    are already hash-checked by trajectory_jaccard_pairs)."""
    from ..operators.trajectory import trajectory_topk_similar

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", F.expr(_EV_LNG).alias("lng"), F.expr(_EV_LAT).alias("lat")
    )
    return trajectory_topk_similar(
        pts, "user_id", "lng", "lat", query_ids=[0, 1, 2, 3], k=5, cell_deg=10.0
    ).orderBy("q_id", "rank")
