"""Live HTTP tile egress over a loopback server (SURVEY.md §2.1 S2):
the reference fetches XYZ tiles with auth headers over real HTTP
(`/root/reference/dataproviders.py:96-105`,
`update_ways_metadata.py:88-89`). These tests stand up an in-process
``http.server`` on 127.0.0.1 and drive the SAME code paths a live
deployment uses — executor-side GETs from ``http_tiles`` and the CLI's
``--url`` provider override — asserting server-side that every request
carried the configured auth header and that each distinct tile was
fetched exactly once (the dedup-then-join contract)."""

from __future__ import annotations

import threading
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.sources.tiles import http_tiles, synth_tile_array

AUTH = "Bearer test-token-xyz"


class _TileServer:
    """Serves synthetic 'L' tiles at /tiles/{z}/{x}/{y}; records every
    request's path + Authorization header; 404s tiles in `missing`."""

    def __init__(self, tile_size: int = 64):
        self.tile_size = tile_size
        self.requests: list[tuple[str, str | None]] = []
        self.missing: set[tuple[int, int, int]] = set()
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                with outer.lock:
                    outer.requests.append(
                        (self.path, self.headers.get("Authorization"))
                    )
                try:
                    _, z, x, y = self.path.strip("/").split("/")
                    z, x, y = int(z), int(x), int(y)
                except ValueError:
                    self.send_error(400)
                    return
                if (z, x, y) in outer.missing:
                    self.send_error(404)
                    return
                body = synth_tile_array(x, y, z, "L", outer.tile_size).tobytes()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    @property
    def url_template(self) -> str:
        return f"http://127.0.0.1:{self.port}/tiles/${{z}}/${{x}}/${{y}}"

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def server():
    s = _TileServer()
    yield s
    s.stop()


def test_http_tiles_live_fetch_with_auth(spark, server):
    """Executor-side GETs: correct bytes for every distinct tile, one
    request per distinct tile despite duplicate coordinates, auth
    header present on every request server-side."""
    needed = spark.createDataFrame(
        # duplicates on purpose: the source must dedup before fetching
        [(12, 701, 1635), (12, 701, 1635), (12, 702, 1635), (12, 702, 1636)],
        "z int, x long, y long",
    )
    tiles = http_tiles(
        spark,
        needed,
        server.url_template,
        mode="L",
        tile_size=server.tile_size,
        headers={"Authorization": AUTH},
    ).collect()
    assert len(tiles) == 3
    for t in tiles:
        want = synth_tile_array(t.x, t.y, t.z, "L", server.tile_size).tobytes()
        assert bytes(t.img) == want
    paths = Counter(p for p, _ in server.requests)
    assert all(n == 1 for n in paths.values()), f"re-fetched: {paths}"
    assert len(paths) == 3
    assert all(h == AUTH for _, h in server.requests)


def test_http_tiles_fetch_failure_propagates_null(spark, server):
    """A 404 tile yields img NULL (P11 deviation: propagate, don't
    crash), other tiles in the same batch unaffected."""
    server.missing.add((12, 5, 6))
    needed = spark.createDataFrame(
        [(12, 5, 6), (12, 5, 7)], "z int, x long, y long"
    )
    rows = {
        (r.z, r.x, r.y): r.img
        for r in http_tiles(
            spark, needed, server.url_template, "L", server.tile_size
        ).collect()
    }
    assert rows[(12, 5, 6)] is None
    assert (
        bytes(rows[(12, 5, 7)])
        == synth_tile_array(5, 7, 12, "L", server.tile_size).tobytes()
    )


def test_cli_url_path_hits_live_server_with_config_headers(spark, server, tmp_path):
    """The reference's authed high-res flow end-to-end
    (`update_ways_metadata.py:88-89`): run() with a --url template and
    a config carrying provider headers fetches every distinct tile
    from the live server (auth asserted server-side) and produces the
    IDENTICAL table to the offline synthetic provider — the server
    serves the same closed-form tiles."""
    from ariadne_cartograph_spark.operators.merge import ParquetMergeTable
    from ariadne_cartograph_spark.update_ways_metadata import load_ways, run

    ways = load_ways(spark, "osm:/root/reference/osm/example.osm").localCheckpoint(
        eager=True
    )
    config = {"providers": {"strava": {"headers": {"Authorization": AUTH}}}}

    live_out = str(tmp_path / "wm_live")
    # strava's zoom-12 'L' provider, tile_size via the synthetic server
    import dataclasses

    from ariadne_cartograph_spark import update_ways_metadata as M

    # shrink the provider's tile_size to the server's (64) so the test
    # fetches small bodies; the math is tile_size-parametric
    orig = M.PROVIDERS["strava"]
    M.PROVIDERS["strava"] = (
        orig[0],
        dataclasses.replace(orig[1], tile_size=server.tile_size),
    )
    try:
        written = run(
            spark,
            ways,
            live_out,
            ["strava"],
            config=config,
            url_templates={"strava": server.url_template},
        )
        offline_out = str(tmp_path / "wm_offline")
        run(spark, ways, offline_out, ["strava"])
    finally:
        M.PROVIDERS["strava"] = orig

    assert written == {"popularity": 604}
    assert server.requests and all(h == AUTH for _, h in server.requests)
    live = {
        (r.gid, r.popularity)
        for r in ParquetMergeTable(spark, live_out, key="gid").read().collect()
    }
    offline = {
        (r.gid, r.popularity)
        for r in ParquetMergeTable(spark, offline_out, key="gid").read().collect()
    }
    assert live == offline
