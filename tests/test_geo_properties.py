"""Property tests for the Web-Mercator / tile-pixel column math
(SURVEY.md §5.2 item 5: P5/P6 are the only ops worth property-testing;
each batch of generated coordinates runs through Spark ONCE and is
compared against a literal pure-python re-implementation of the
reference formulas (/root/reference/dataproviders.py:25-56)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ariadne_cartograph_spark.functions.geo import lnglat_to_tile_pixel

TILE = 256


def _ref_project(lng: float, lat: float) -> tuple[float, float]:
    siny = math.sin(lat * math.pi / 180.0)
    siny = min(max(siny, -0.9999), 0.9999)
    wx = TILE * (0.5 + lng / 360.0)
    wy = TILE * (0.5 - math.log((1 + siny) / (1 - siny)) / (4 * math.pi))
    return wx, wy


def _ref_tile_pixel(w: float, zoom: int) -> tuple[int, int]:
    scale = 1 << zoom
    pixel = math.floor((w * scale) % TILE)
    tile = math.floor(w * scale / TILE)
    return tile, pixel


coords = st.tuples(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(coords, min_size=1, max_size=40), st.integers(min_value=0, max_value=18))
def test_tile_pixel_matches_reference_formulas(spark, pts, zoom):
    df = spark.createDataFrame(pts, "lng double, lat double")
    tx, ty, px, py = lnglat_to_tile_pixel("lng", "lat", zoom, TILE)
    rows = df.select(
        "lng", "lat",
        tx.alias("tx"), ty.alias("ty"), px.alias("px"), py.alias("py"),
    ).collect()
    assert len(rows) == len(pts)
    for r in rows:
        wx, wy = _ref_project(r.lng, r.lat)
        etx, epx = _ref_tile_pixel(wx, zoom)
        ety, epy = _ref_tile_pixel(wy, zoom)
        assert (r.tx, r.px) == (etx, epx), (r.lng, r.lat, zoom)
        assert (r.ty, r.py) == (ety, epy), (r.lng, r.lat, zoom)
        # pixels are always in [0, TILE) (python-modulo semantics);
        # tile indices stay in [0, 2^z] only inside the Web-Mercator
        # domain |lat| <= 85.05 (clamped latitudes project outside the
        # world square, exactly as the reference's math does)
        assert 0 <= r.px < TILE and 0 <= r.py < TILE
        assert 0 <= r.tx <= (1 << zoom)
        if abs(r.lat) <= 85.0:
            assert 0 <= r.ty <= (1 << zoom)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
        min_size=2, max_size=30, unique=True,
    )
)
def test_world_x_monotone_in_lng(spark, lngs):
    df = spark.createDataFrame([(v,) for v in lngs], "lng double")
    from ariadne_cartograph_spark.functions.geo import project_4326_to_3857

    wx, _ = project_4326_to_3857("lng", F.lit(0.0), TILE)
    got = [r.wx for r in df.select(F.col("lng"), wx.alias("wx")).orderBy("lng").collect()]
    assert got == sorted(got)


# ---- Morton / Z-order key properties ---------------------------------------


def _ref_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_morton_key_matches_reference_bit_interleave(spark, pts):
    from ariadne_cartograph_spark.sources.layout import morton_key

    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", morton_key("x", "y", bits=16).alias("z")).collect()
    for r in rows:
        assert r.z == _ref_morton(r.x, r.y), (r.x, r.y)


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 16) - 2),
    st.integers(min_value=0, max_value=(1 << 16) - 2),
)
def test_morton_key_is_injective_on_neighbors(spark, x, y):
    """Distinct (x,y) → distinct keys on the 2x2 neighborhood (local
    injectivity — the interleave loses nothing)."""
    pts = [(x + dx, y + dy) for dx in (0, 1) for dy in (0, 1)]
    keys = {_ref_morton(a, b) for a, b in pts}
    assert len(keys) == 4
