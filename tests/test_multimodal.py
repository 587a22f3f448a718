"""Multimodal stub-layer tests: real Spark plumbing, deterministic fakes."""

from __future__ import annotations

import hashlib

from facturas_spark.sources.multimodal import (
    MEDIA_DDL,
    audio_features,
    frame_sample,
    image_features,
    resize_plan,
    synth_media_rows,
)

N = 30


def _media(spark):
    return spark.createDataFrame(synth_media_rows(N, seed=42), MEDIA_DDL)


def test_image_features(spark):
    rows = {r.media_id: r for r in image_features(_media(spark)).collect()}
    raw = {t[0]: t for t in synth_media_rows(N, seed=42)}
    assert set(rows) == {i for i in range(N) if i % 3 == 0}
    for mid, r in rows.items():
        payload = raw[mid][2]
        assert r.mean_intensity == hashlib.md5(payload).digest()[0] / 255.0
        assert r.phash == hashlib.md5(b"phash:" + payload).hexdigest()[:16]
        assert r.width >= 640 and r.height >= 480


def test_resize_plan_aspect(spark):
    rows = resize_plan(_media(spark), max_side=256).collect()
    assert len(rows) > 0
    for r in rows:
        assert max(r.target_w, r.target_h) <= 256
        # aspect preserved within ceil rounding
        assert abs(r.target_w / r.target_h - r.width / r.height) < 0.02
        # never upscale
        assert r.target_w <= r.width and r.target_h <= r.height


def test_frame_sample_grid(spark):
    out = frame_sample(_media(spark), fps=0.5).collect()
    raw = {t[0]: t for t in synth_media_rows(N, seed=42)}
    by_media: dict[int, list] = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, frames in by_media.items():
        duration = raw[mid][3][2]
        expected = max(1, int(duration * 0.5))
        assert len(frames) == expected, (mid, duration)
        ts = sorted(f.ts_s for f in frames)
        assert ts[0] == 0.0
        if len(ts) > 1:
            assert ts[1] - ts[0] == 2.0  # 1/fps spacing
        # frame hashes deterministic and distinct per timestamp
        assert len({f.frame_hash for f in frames}) == len(frames)


def test_audio_features(spark):
    rows = audio_features(_media(spark)).collect()
    assert all(len(r.embedding) == 8 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.embedding)
    assert all(r.duration_bucket == int(r.duration_s // 10) for r in rows)


def test_no_shuffle_in_feature_plans(spark):
    m = _media(spark)
    for df in (image_features(m), audio_features(m), frame_sample(m)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan