"""Multimodal operator tests: deterministic fake-decode contract,
nearest-neighbor resize vs a local numpy oracle, frame-sampling
cardinality, and audio stats (SURVEY.md §2.7 U3 + north-star
"multimodal columns"). The hash-level parity of the feature extractors
is covered by test_oracle_parity via the registered queries.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ariadne_cartograph_spark.operators import multimodal as M
from ariadne_cartograph_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return M.media_from_documents(docs).cache()


def test_media_schema_and_types(media):
    # nullability flags differ between expression-derived and declared
    # schemas; names + types are the contract
    assert media.schema.simpleString() == M.MEDIA_SCHEMA.simpleString()
    counts = dict(media.groupBy("media_type").count().collect())
    assert set(counts) == {"image", "audio", "video"}
    assert sum(counts.values()) == 60


def test_decode_media_fake_is_prefix_bytes():
    payload = bytes(range(100))
    arr = M.decode_media(payload, width=6, height=6, channels=1)
    assert arr.shape == (6, 6, 1)
    assert arr.flatten().tolist() == list(range(36))
    with pytest.raises(NotImplementedError):
        M.decode_media(b"xy", width=10, height=10, channels=1)


def test_image_features_match_local_numpy(media):
    rows = {r["media_id"]: r for r in M.image_features(media).collect()}
    src = media.filter(F.col("media_type") == "image").collect()
    assert len(rows) == len(src) > 0
    for r in src:
        side = r.meta.width
        arr = np.frombuffer(bytes(r.payload), dtype=np.uint8)[: side * side]
        got = rows[r.media_id]
        assert got.mean_px == pytest.approx(arr.mean(), abs=0)
        assert got.min_px == arr.min() and got.max_px == arr.max()


def test_resize_nearest_neighbor_oracle(media):
    out = {r["media_id"]: r for r in M.resize_media(media, 8, 8).collect()}
    src = media.filter(F.col("media_type") == "image").collect()
    for r in src:
        m = r.meta
        arr = np.frombuffer(bytes(r.payload), dtype=np.uint8)[: m.width * m.height]
        arr = arr.reshape(m.height, m.width)
        ys = (np.arange(8) * m.height) // 8
        xs = (np.arange(8) * m.width) // 8
        expect = arr[np.ix_(ys, xs)]
        got = out[r.media_id]
        assert got.meta.width == 8 and got.meta.height == 8
        assert np.frombuffer(bytes(got.payload), dtype=np.uint8).tolist() == (
            expect.flatten().tolist()
        )


def test_sample_frames_stride_and_means(media, spark):
    frames = M.sample_frames(media, stride=4).collect()
    src = {r.media_id: r for r in media.filter(F.col("media_type") == "video").collect()}
    assert frames
    by_id: dict[int, list] = {}
    for fr in frames:
        by_id.setdefault(fr.media_id, []).append(fr)
    for mid, frs in by_id.items():
        n_frames = src[mid].meta.n_frames
        assert sorted(f.frame_idx for f in frs) == list(range(0, n_frames, 4))
        for f in frs:
            seg = np.frombuffer(bytes(src[mid].payload), dtype=np.uint8)[
                f.frame_idx * 16 : (f.frame_idx + 1) * 16
            ]
            assert bytes(f.frame) == seg.tobytes()
            assert f.frame_mean == pytest.approx(seg.mean(), abs=0)


def test_audio_features_rms(media):
    out = {r.media_id: r for r in M.audio_features(media).collect()}
    src = media.filter(F.col("media_type") == "audio").collect()
    assert len(out) == len(src) > 0
    for r in src:
        arr = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.int64)
        got = out[r.media_id]
        assert got.n_samples == len(arr)
        assert got.rms == pytest.approx(float(np.sqrt((arr * arr).sum() / len(arr))), abs=0)
        assert got.duration_s == pytest.approx(len(arr) / 8000, abs=0)


def test_feature_plan_has_no_shuffle(media):
    plan = M.image_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
