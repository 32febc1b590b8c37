"""Multimodal columns (SURVEY.md §2K-K5): image/audio/video as opaque
``binary`` payloads + typed metadata structs.

The Spark-side plumbing is real — schema, Arrow-batched mapInPandas,
partition-preserving signatures.  The *decode* step is stubbed: the
container ships no image/audio codecs, so `decode_image` either uses a
clearly-marked deterministic fake (default) or raises NotImplementedError
when a real decode is requested (SURVEY.md north-star note).

At 100 TB: binary payloads dominate scan bytes, so the metadata struct is
kept in separate (pruned) columns — a query touching only metadata never
reads payload bytes from parquet (column pruning).  mapInPandas streams
Arrow batches, so peak executor memory is one batch of payloads, not one
partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Model a media table from the documents fixture: payload = utf-8
    bytes of the text (a stand-in for image bytes), metadata typed."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def decode_image_stub(payload: bytes, *, fake: bool = True) -> tuple[int, int]:
    """STUB: real decode needs an image codec not present in this
    container.  ``fake=True`` derives deterministic (width, height) from
    the payload so downstream plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec (e.g. Pillow); "
            "not available in this environment — run with fake=True"
        )
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps the batch shape (no shuffle, partition-preserving);
    the per-batch loop is the only Python in the multimodal path.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode_image_stub(p, fake=True) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    # cheap rolling checksum — deterministic, codec-free
                    "checksum": [
                        sum((i + 1) * b for i, b in enumerate(p)) % (1 << 31)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_bytes", LongType()),
    ]
)


def resize_stub(payload: bytes, target_bytes: int, *, fake: bool = True) -> bytes:
    """STUB resize: a real implementation needs an image codec.  The fake
    is a deterministic truncate-or-cycle to ``target_bytes`` so the
    pipeline shape (binary in → binary out, size contract) is testable."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an image codec (e.g. Pillow); "
            "not available in this environment — run with fake=True"
        )
    if not payload:
        return b"\x00" * target_bytes
    reps = target_bytes // len(payload) + 1
    return (payload * reps)[:target_bytes]


def resize_media(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Arrow-batched binary→binary transform (the resize plumbing):
    partition-preserving mapInPandas, payload column replaced, metadata
    recomputed — the exact shape a Pillow-backed resize drops into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [resize_stub(p, target_bytes, fake=True) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) for p in out],
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 32, every_n: int = 2) -> DataFrame:
    """Frame sampling: 1 video payload → N frame rows (every ``every_n``-th
    fixed-size chunk — the stand-in for keyframe extraction).  The fan-out
    happens inside mapInPandas, so a 100 GB partition of videos streams
    out as frame batches without ever materializing all frames of one
    partition in memory."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                chunks = [
                    p[o : o + frame_bytes]
                    for o in range(0, len(p), frame_bytes)
                ]
                for i, c in enumerate(chunks[::every_n]):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(c)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_bytes": [len(c) for c in frames],
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
