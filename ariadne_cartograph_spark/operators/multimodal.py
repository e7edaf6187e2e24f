"""Multimodal column operators (north-star "multimodal columns"):
image/audio/video treated as opaque ``binary`` payloads + a typed
metadata struct, with decode / feature-extract / resize / frame-sample
implemented as Arrow-batched pandas stages over ``mapInPandas``.

The reference's only raster handling is PIL decode of HTTP tiles
(`/root/reference/dataproviders.py:96-105`,
`/root/reference/update_ways_metadata.py:109-124`); this module is the
generalized media surface a training-data pipeline needs on top of it.

Codec stub contract: this container ships no image/audio codecs, so
``decode_media`` uses a clearly-marked DETERMINISTIC FAKE — the payload
bytes ARE the samples (uint8, row-major) — and gates a real-codec path
behind an import-try (PIL). The Spark-side plumbing (schemas, binary
columns, Arrow batch shapes, partitioning) is real and oracle-tested:
because the fake is bytewise-deterministic, every feature extractor
below hash-matches a DuckDB SQL oracle computing the same statistics
from the same bytes.

Scale design (100 TB of media):
- payloads never pass through Python row-at-a-time — each mapInPandas
  batch holds many media blobs and all per-blob math is numpy;
- feature extraction is embarrassingly parallel (no shuffle at all:
  scan → mapInPandas → project). Partition sizing is governed by
  ``spark.sql.files.maxPartitionBytes``, which is the right knob when
  rows are megabyte-scale blobs;
- frame sampling emits rows (media_id, frame_idx, frame) — an
  explode-shaped expansion done inside the same Arrow batch, so frame
  bytes are sliced once and never re-shuffled;
- resize shrinks payloads early (the classic "decode once, shrink
  immediately" pipeline shape), so downstream stages move less data.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Probe for the real-codec path ONCE at import time: a failed import is
# not cached in sys.modules, so probing inside decode_media made every
# decoded row pay a full sys.path search before falling through to the
# stdlib/fake path (guide §4: heavyweight init once per task, never per
# row). Executors import this module once per worker process.
try:  # real codec, unavailable in this container
    from PIL import Image as _PIL_IMAGE
except Exception:
    _PIL_IMAGE = None

META_STRUCT = (
    "struct<width:int,height:int,channels:int,sample_rate:int,"
    "frame_bytes:int,n_frames:int>"
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("frame_bytes", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

AUDIO_SAMPLE_RATE = 8000
FRAME_BYTES = 16


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table derived from `documents`
    (the container has no real media fixtures): payload = UTF-8 bytes
    of `text`; media_type cycles image/audio/video on doc_id % 3; image
    dims are the largest square that fits the payload
    (side = floor(sqrt(n_chars)), channels=1). Pure column expressions
    — reproducible in any engine, which is what makes the downstream
    feature extractors oracle-checkable.
    """
    side = F.floor(F.sqrt(F.col("n_chars").cast("double"))).cast("int")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            side.alias("width"),
            side.alias("height"),
            F.lit(1).alias("channels"),
            F.lit(AUDIO_SAMPLE_RATE).alias("sample_rate"),
            F.lit(FRAME_BYTES).alias("frame_bytes"),
            F.floor(F.col("n_chars") / FRAME_BYTES).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """bytes → (height, width, channels) uint8 array.

    DETERMINISTIC FAKE DECODE: the payload's first width*height*channels
    bytes are taken as row-major samples. A real-codec path (PIL) is
    attempted first for payloads that are actual encoded images; the
    fake is the documented fallback in this codec-less container.
    """
    if _PIL_IMAGE is not None:  # real path, unavailable in this container
        try:
            from io import BytesIO

            img = _PIL_IMAGE.open(BytesIO(payload))
            arr = np.asarray(img, dtype=np.uint8)
            return arr.reshape(arr.shape[0], arr.shape[1], -1)
        except Exception:
            pass
    if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
        # Stdlib PNG path (sources/tiles.decode_png) — real decode for
        # the one codec this container can honestly support without PIL.
        from ..sources.tiles import decode_png

        arr = decode_png(bytes(payload))
        return arr.reshape(arr.shape[0], arr.shape[1], -1)
    need = width * height * channels
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    if len(arr) < need:
        raise NotImplementedError(
            f"payload has {len(arr)} bytes < {need}; real decode needs a codec"
        )
    return arr[:need].reshape(height, width, channels)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_px", DoubleType()),
        StructField("min_px", IntegerType()),
        StructField("max_px", IntegerType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image brightness statistics over the decoded pixel array.
    Plan shape: scan → mapInPandas → done (zero shuffles); the sums are
    exact integer arithmetic in float64, so values hash-match any
    engine computing the same bytes.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, means, mins, maxs = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                m = row.meta
                arr = decode_media(row.payload, m["width"], m["height"], m["channels"])
                ids.append(row.media_id)
                ws.append(m["width"])
                hs.append(m["height"])
                means.append(float(arr.sum(dtype=np.int64)) / arr.size)
                mins.append(int(arr.min()))
                maxs.append(int(arr.max()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "mean_px": means,
                    "min_px": pd.array(mins, dtype="int32"),
                    "max_px": pd.array(maxs, dtype="int32"),
                }
            )

    imgs = media.filter(F.col("media_type") == "image").select(
        "media_id", "payload", "meta"
    )
    return imgs.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every image payload to (out_w, out_h)
    — src index = floor(dst * src_dim / out_dim), the standard NN
    mapping, exactly reproducible. Returns the media frame with payload
    and meta replaced (channels preserved). At pipeline scale this is
    the shrink-early stage: run it immediately after decode so every
    later stage shuffles the small payload.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for row in pdf.itertuples(index=False):
                m = row.meta
                arr = decode_media(row.payload, m["width"], m["height"], m["channels"])
                ys = (np.arange(out_h) * m["height"]) // out_h
                xs = (np.arange(out_w) * m["width"]) // out_w
                small = arr[np.ix_(ys, xs)]
                out_rows.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "payload": small.tobytes(),
                        "meta": {
                            "width": out_w,
                            "height": out_h,
                            "channels": m["channels"],
                            "sample_rate": m["sample_rate"],
                            "frame_bytes": m["frame_bytes"],
                            "n_frames": m["n_frames"],
                        },
                    }
                )
            yield pd.DataFrame(out_rows, columns=["media_id", "media_type", "payload", "meta"])

    imgs = media.filter(F.col("media_type") == "image")
    return imgs.mapInPandas(do_resize, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_mean", DoubleType()),
    ]
)


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Video frame sampling: the payload is n_frames fixed-size frames
    (meta.frame_bytes each); emit every ``stride``-th frame as its own
    row with the frame bytes and mean sample value. The row expansion
    happens inside the Arrow batch (explode-shaped, no join/shuffle);
    downstream per-frame stages then parallelize over frames, not
    videos — the skew fix for long videos.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, means = [], [], [], []
            for row in pdf.itertuples(index=False):
                m = row.meta
                fb = m["frame_bytes"]
                data = np.frombuffer(bytes(row.payload), dtype=np.uint8)
                for fi in range(0, m["n_frames"], stride):
                    fr = data[fi * fb : (fi + 1) * fb]
                    ids.append(row.media_id)
                    idxs.append(fi)
                    blobs.append(fr.tobytes())
                    means.append(float(fr.sum(dtype=np.int64)) / fb)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": blobs,
                    "frame_mean": means,
                }
            )

    vids = media.filter(F.col("media_type") == "video").select(
        "media_id", "payload", "meta"
    )
    return vids.mapInPandas(frames, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio stats treating the payload as uint8 PCM at
    meta.sample_rate: RMS (sqrt of exact integer mean-square), peak,
    duration. Same zero-shuffle mapInPandas shape as image_features.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, durs, rmss, peaks = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                m = row.meta
                arr = np.frombuffer(bytes(row.payload), dtype=np.uint8).astype(np.int64)
                ids.append(row.media_id)
                ns.append(len(arr))
                durs.append(len(arr) / m["sample_rate"])
                rmss.append(float(np.sqrt((arr * arr).sum() / len(arr))))
                peaks.append(int(arr.max()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": pd.array(ns, dtype="int64"),
                    "duration_s": durs,
                    "rms": rmss,
                    "peak": pd.array(peaks, dtype="int32"),
                }
            )

    auds = media.filter(F.col("media_type") == "audio").select(
        "media_id", "payload", "meta"
    )
    return auds.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)
