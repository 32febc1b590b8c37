"""Multimodal plumbing gates (SURVEY.md §2K-K5): binary payloads through
Arrow-batched transforms — metadata pruning, resize contract, frame
sampling reassembly, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.operators.multimodal import (
    decode_image_stub,
    documents_as_media,
    resize_media,
    resize_stub,
    sample_frames,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_resize_contract(spark):
    media = documents_as_media(load_table(spark, SF, "documents")).limit(50)
    out = resize_media(media, target_bytes=64)
    rows = out.select("n_bytes").distinct().collect()
    assert [r["n_bytes"] for r in rows] == [64]
    assert out.count() == 50  # 1:1, partition-preserving


def test_sample_frames_counts_and_sizes(spark):
    media = documents_as_media(load_table(spark, SF, "documents")).limit(50)
    frames = sample_frames(media, frame_bytes=32, every_n=2)
    joined = (
        frames.groupBy("media_id")
        .agg(F.count("*").alias("n"), F.max("frame_bytes").alias("maxb"))
        .join(media.select("media_id", "n_bytes"), "media_id")
    )
    # arithmetic check: n == ceil(ceil(n_bytes/32)/2), no frame over 32B
    expected = joined.withColumn(
        "want",
        F.floor((F.floor((F.col("n_bytes") + 31) / 32) + 1) / 2),
    )
    assert expected.where(F.col("n") != F.col("want")).count() == 0
    assert joined.where(F.col("maxb") > 32).count() == 0


def test_stubs_raise_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"xx", fake=False)
    with pytest.raises(NotImplementedError):
        resize_stub(b"xx", 8, fake=False)
