"""Multimodal plumbing: real schemas/batching, stubbed codecs."""

from __future__ import annotations

import pytest

from mapreducewordcount_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    sample_video_frames,
    size_bucketed,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 251]) * (100 + 37 * i), "png") for i in range(40)]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, format string")


def test_real_decode_path_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", "png", fake=False)


def test_feature_extraction_schema_and_determinism(spark, media):
    feats = extract_image_features(media, fake=True)
    assert [f.name for f in feats.schema] == [
        "media_id", "n_bytes", "format", "width", "height",
        "mean_r", "mean_g", "mean_b"]
    a = {r.media_id: (r.width, r.height, r.mean_r) for r in feats.collect()}
    b = {r.media_id: (r.width, r.height, r.mean_r) for r in feats.collect()}
    assert a == b and len(a) == 40  # deterministic across runs
    assert all(16 <= w < 80 for w, _, _ in a.values())


def test_size_bucketed_spreads_rows(spark, media):
    spread = size_bucketed(media)
    assert spread.rdd.getNumPartitions() > 1
    assert spread.count() == 40


def test_video_frame_sampling_explodes_rows(spark, media):
    frames = sample_video_frames(media, every_n=2)
    rows = frames.collect()
    assert len(rows) > 40  # one-to-many
    assert all(isinstance(bytes(r.frame_payload), bytes) for r in rows)
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_index)
    for idxs in per_media.values():
        assert sorted(idxs) == list(range(len(idxs)))
