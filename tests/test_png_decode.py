"""decode_png round-trip tests. The encoder lives HERE (tests only):
it writes spec-compliant PNGs (zlib scanlines, per-row filter byte,
CRC32 chunk trailers) with a caller-chosen filter per row, so every
reconstruction branch of the decoder is exercised against an
independent implementation of the same public spec (RFC 2083)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ariadne_cartograph_spark.sources.tiles import (
    decode_png,
    decode_tile,
    synth_tile_array,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(cur, prev, ch, f):
    """Forward-filter one reconstructed row (spec §9) — the encoder
    side of what decode_png undoes."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.zeros_like(cur)
    left[ch:] = cur[:-ch]
    ul = np.zeros_like(cur)
    ul[ch:] = prev[:-ch]
    if f == 0:
        out = cur
    elif f == 1:
        out = cur - left
    elif f == 2:
        out = cur - prev
    elif f == 3:
        out = cur - ((left + prev) >> 1)
    elif f == 4:
        p = left + prev - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
        )
        out = cur - pred
    return (out & 0xFF).astype(np.uint8)


def encode_png(arr: np.ndarray, filters) -> bytes:
    """arr: HxW (grey) or HxWxC uint8; filters: per-row filter ids."""
    if arr.ndim == 2:
        h, w, ch = arr.shape[0], arr.shape[1], 1
        flat = arr.reshape(h, w)
        color = 0
    else:
        h, w, ch = arr.shape
        flat = arr.reshape(h, w * ch)
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        f = filters[r % len(filters)]
        lines.append(f)
        lines.extend(_filter_row(flat[r], prev, ch, f).tobytes())
        prev = flat[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("shape", [(16, 16), (16, 16, 3), (8, 12, 4), (5, 7, 2)])
def test_round_trip_all_filters(filters, shape):
    rng = np.random.default_rng(sum(filters) * 100 + len(shape))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr, filters)), arr)


def test_synthetic_tile_round_trip():
    for mode, ts in (("L", 64), ("RGB", 32)):
        arr = synth_tile_array(3, 5, 12, mode, ts)
        png = encode_png(arr, [0, 1, 2, 3, 4])
        assert np.array_equal(decode_tile(png, "png", ts), arr)


def test_rejects_unsupported_shapes():
    arr = np.zeros((4, 4), dtype=np.uint8)
    png = bytearray(encode_png(arr, [0]))
    # flip bit depth to 16 in IHDR (offset: 8 magic + 8 len/type + 8 w/h)
    png[8 + 8 + 8] = 16
    # CRC now wrong but IHDR parses first; depth check must fire
    with pytest.raises(NotImplementedError):
        decode_png(bytes(png))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_multiple_idat_chunks():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    full = encode_png(arr, [2])
    # split the single IDAT into two chunks
    magic, rest = full[:8], full[8:]
    ihdr_len = 8 + 13 + 4
    ihdr, rest = rest[:ihdr_len], rest[ihdr_len:]
    (dlen,) = struct.unpack(">I", rest[:4])
    payload = rest[8:8 + dlen]
    iend = rest[12 + dlen:]
    a, b = payload[: dlen // 2], payload[dlen // 2:]
    rebuilt = magic + ihdr + _chunk(b"IDAT", a) + _chunk(b"IDAT", b) + iend
    assert np.array_equal(decode_png(rebuilt), arr)


def test_multimodal_decode_media_png_payload():
    from ariadne_cartograph_spark.operators.multimodal import decode_media

    arr = np.arange(96, dtype=np.uint8).reshape(4, 8, 3)
    out = decode_media(encode_png(arr, [1, 4]), 8, 4, 3)
    assert out.shape == (4, 8, 3)
    assert np.array_equal(out, arr)
