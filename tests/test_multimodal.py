"""Multimodal plumbing: stub decode gating, deterministic features,
frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validation_database_spark.operators.multimodal import (
    FEATURE_DIM,
    assets_from_documents,
    decode_image_stub,
    extract_features,
    sample_frames,
)
from validation_database_spark.sources import load_table


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc")


def test_decode_stub_fake_is_deterministic():
    a = decode_image_stub(b"hello world", deterministic_fake=True)
    b = decode_image_stub(b"hello world", deterministic_fake=True)
    assert a.shape == (8, 8)
    assert (a == b).all()


def test_extract_features_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    assets = assets_from_documents(docs)
    feats = extract_features(assets)
    rows1 = {r.asset_id: (r.n_bytes, r.payload_crc, tuple(r.features)) for r in feats.collect()}
    rows2 = {r.asset_id: (r.n_bytes, r.payload_crc, tuple(r.features)) for r in feats.collect()}
    assert rows1 == rows2
    assert len(rows1) == 50
    for n_bytes, crc, f in rows1.values():
        assert n_bytes > 0
        assert len(f) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in f)


def test_payload_matches_text_bytes(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(20)
    assets = assets_from_documents(docs)
    joined = assets.join(docs, assets.asset_id == docs.doc_id).select(
        "asset_id", "payload", "text"
    )
    for r in joined.collect():
        assert bytes(r.payload) == r.text.encode("utf-8")


def test_sample_frames_counts(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(100)
    assets = assets_from_documents(docs)
    frames = sample_frames(assets, every_ms=1000)
    counts = {r.asset_id: r.n for r in frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()}
    durations = {
        r.asset_id: r.d
        for r in assets.filter(F.col("meta.modality") == "video")
        .select("asset_id", F.col("meta.duration_ms").alias("d"))
        .collect()
    }
    assert set(counts) == set(durations)
    for aid, n in counts.items():
        expected = max(durations[aid] - 1, 0) // 1000 + 1
        assert n == expected, (aid, n, expected, durations[aid])


def test_frame_checksums_edges(spark):
    """Kernel edge cases the fixtures never hit: NULL payload (0
    frames), payload shorter than one frame (1 truncated frame), and
    a length landing a truncated final frame (n % 32 in [1, 16))."""
    from validation_database_spark.operators.multimodal import frame_checksums

    rows = [
        (1, None),
        (2, bytes(range(5))),            # one frame, len 5, crc 0+1+2+3+4
        (3, bytes([1]) * 40),            # frames at 0 (len 16) and 32 (len 8)
        (4, bytes([2]) * 64),            # frames at 0 and 32, both len 16
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {
        (r.asset_id, r.frame_off): (r.frame_len, r.frame_crc)
        for r in frame_checksums(df).collect()
    }
    assert got == {
        (2, 0): (5, 10),
        (3, 0): (16, 16),
        (3, 32): (8, 8),
        (4, 0): (16, 32),
        (4, 32): (16, 32),
    }
