"""The reference's top-level script surface
(`/root/reference/update_ways_metadata.py:128-144`) as a Spark CLI:
ways import → per-provider median/normalize → per-column ON-CONFLICT
upsert into ways_metadata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators.merge import ParquetMergeTable
from ariadne_cartograph_spark.update_ways_metadata import PROVIDERS, load_ways, run

FIXTURE = "osm:/root/reference/osm/example.osm"


@pytest.fixture(scope="module")
def ways(spark):
    return load_ways(spark, FIXTURE).localCheckpoint(eager=True)


def test_load_ways_is_the_routable_import(ways):
    # the reference's `ways` IS osm2pgrouting's edge table: same census
    assert ways.count() == 604
    assert set(ways.columns) == {"gid", "geom"}


def test_run_mirrors_reference_main(spark, ways, tmp_path):
    """reference main(): strava → popularity, gmaps → greenery, each
    its own ON CONFLICT upsert; values normalized to [0,1] by the
    global max median (so max == 1.0 exactly)."""
    out = str(tmp_path / "wm")
    written = run(spark, ways, out, ["strava", "gmaps"], n_buckets=4)
    assert written == {"popularity": 604, "greenery": 604}
    t = ParquetMergeTable(spark, out, key="gid", n_buckets=4)
    rows = t.read().collect()
    assert len(rows) == 604
    pops = [r.popularity for r in rows]
    greens = [r.greenery for r in rows]
    for vals in (pops, greens):
        finite = [v for v in vals if v is not None and not math.isnan(v)]
        assert finite and max(finite) == pytest.approx(1.0)
        assert all(0.0 <= v <= 1.0 for v in finite)


def test_per_column_upsert_preserves_other_columns(spark, ways, tmp_path):
    """Re-running one provider (the reference's per-column ON CONFLICT
    DO UPDATE SET {col}) must not clobber the other's column."""
    out = str(tmp_path / "wm2")
    run(spark, ways, out, ["strava"])
    run(spark, ways, out, ["gmaps"])
    t = ParquetMergeTable(spark, out, key="gid")
    first = {r.gid: (r.popularity, r.greenery) for r in t.read().collect()}
    run(spark, ways, out, ["gmaps"])  # gmaps again
    second = {r.gid: (r.popularity, r.greenery) for r in t.read().collect()}
    assert first == second  # idempotent re-enrichment, popularity intact
    assert all(p is not None for p, _ in first.values())


def test_unknown_provider_rejected(spark, ways, tmp_path):
    with pytest.raises(ValueError, match="unknown provider"):
        run(spark, ways, str(tmp_path / "wm3"), ["bing"])
    assert set(PROVIDERS) == {"strava", "strava_highres", "gmaps"}


def test_enrichment_lineage_executes_once_per_provider(spark, ways, tmp_path, monkeypatch):
    """run() must materialize each provider's enrichment exactly once
    (localCheckpoint) — upsert's bucket census + merged write + the
    row count would otherwise re-execute the whole sampling lineage
    (tile fetches included) three times per provider. Pinned by an
    accumulator inside the cogrouped sampler: with one physical
    execution it counts each distinct tile exactly once."""
    from ariadne_cartograph_spark.operators import enrich as enrich_mod

    acc = spark.sparkContext.accumulator(0)
    inner = enrich_mod._sample_values

    def counting(pixels, tile, value_kind, tile_size, mode):
        acc.add(1)
        return inner(pixels, tile, value_kind, tile_size, mode)

    monkeypatch.setattr(enrich_mod, "_sample_values", counting)
    out = str(tmp_path / "wm_once")
    written = run(spark, ways, out, ["strava"], n_buckets=4)
    assert written == {"popularity": 604}
    # independent census of the sampler's group count (distinct tiles
    # touched by the fixture at the provider's zoom)
    from ariadne_cartograph_spark.functions.geo import lnglat_to_tile_pixel

    prov = PROVIDERS["strava"][1]
    coords = ways.select(F.explode("geom").alias("pt")).select(
        F.col("pt.lng").alias("lng"), F.col("pt.lat").alias("lat")
    )
    tx, ty, _, _ = lnglat_to_tile_pixel("lng", "lat", prov.zoom, prov.tile_size)
    n_tiles = coords.select(tx.alias("x"), ty.alias("y")).distinct().count()
    assert n_tiles > 0
    # one cogroup invocation per tile per physical execution; the bug
    # this pins (upsert + count re-running the lineage) would triple it
    assert acc.value == n_tiles
