"""Golden ingest tests on the reference's own fixture
(/root/reference/osm/example.osm — read-only; measured counts from
SURVEY.md §5.2 / FIXTURES.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.functions.geometry import (
    geojson_to_linestring,
    is_closed_ring,
    linestring_to_geojson,
)
from ariadne_cartograph_spark.sources.osm import (
    assemble_way_geometries,
    derive_feature_tables,
    read_osm_elements,
    split_elements,
)

OSM_PATH = "/root/reference/osm/example.osm"


@pytest.fixture(scope="module")
def tables(spark):
    elements = read_osm_elements(spark, OSM_PATH).cache()
    t = split_elements(elements)
    t["nodes"] = t["nodes"].cache()
    t["ways"] = t["ways"].cache()
    return t


def test_golden_element_counts(tables):
    assert tables["nodes"].count() == 6223
    assert tables["ways"].count() == 1091
    assert tables["relations"].count() == 32


def test_golden_vertex_and_ring_counts(tables):
    assert tables["ways"].select(
        F.sum(F.size("node_refs"))
    ).collect()[0][0] == 7612
    closed = tables["ways"].filter(is_closed_ring("node_refs")).count()
    assert closed == 792


def test_golden_way_13302656(tables, spark):
    w = tables["ways"].filter(F.col("id") == 13302656).collect()[0]
    assert len(w.node_refs) == 6
    assert w.tags["highway"] == "residential"
    assert w.tags["name"] == "Oakdale Street"
    geo = assemble_way_geometries(tables["nodes"], tables["ways"]).filter(
        F.col("id") == 13302656
    ).collect()[0]
    assert len(geo.geom) == 6
    # vertex order must follow <nd> order: first ref's coords first
    first_node = tables["nodes"].filter(F.col("id") == w.node_refs[0]).collect()[0]
    assert abs(geo.geom[0]["lng"] - first_node.lon) < 1e-9
    assert abs(geo.geom[0]["lat"] - first_node.lat) < 1e-9


def test_geojson_roundtrip(tables, spark):
    g = assemble_way_geometries(tables["nodes"], tables["ways"]).filter(
        F.col("geom").isNotNull() & (F.size("geom") >= 2)
    ).limit(20)
    rt = g.select(
        "id",
        "geom",
        geojson_to_linestring(linestring_to_geojson("geom")).alias("geom2"),
    )
    bad = rt.filter(
        F.size(F.col("geom")) != F.size(F.col("geom2"))
    ).count()
    assert bad == 0
    row = rt.limit(1).collect()[0]
    for p, q in zip(row.geom, row.geom2):
        assert abs(p.lng - q.lng) < 1e-9 and abs(p.lat - q.lat) < 1e-9


def test_feature_tables(tables):
    t = derive_feature_tables(
        tables["nodes"], assemble_way_geometries(tables["nodes"], tables["ways"])
    )
    n_point = t["point"].count()
    n_line = t["line"].count()
    n_poly = t["polygon"].count()
    assert n_line == 1091  # all ways
    assert 0 < n_point < 6223  # only tagged nodes
    assert 0 < n_poly <= 792  # closed+tagged subset
    # style promotion: building column populated for the fixture's ~700
    # buildings
    n_buildings = t["polygon"].filter(F.col("building").isNotNull()).count()
    assert n_buildings >= 650
    # residual map holds non-style keys
    assert "other_tags" in t["line"].columns
