"""Multimodal (image/audio/video) column handling — north-star extension.

The reference is text-only; a 100 TB training-data pipeline also moves
opaque media bytes. Design: media is an ordinary ``binary`` column with
typed metadata alongside — Spark shuffles/stores it like any other
column, so partitioning, predicate pushdown on the metadata, and
columnar parquet encoding all apply; only decode/feature steps drop to
Arrow-batched python (``mapInPandas``), which streams batches and never
materializes a partition of media in memory at once.

The actual codec calls are STUBBED (``decode_image`` raises
``NotImplementedError``: pillow/ffmpeg are not in this container). The
Spark-side plumbing — schema, batch iteration, UDF signatures, chunked
frame explosion — is real and oracle-checked via the deterministic fake
decoder (pure integer arithmetic on byte lengths, reproducible in SQL).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

FRAME_BYTES = 256  # fixed fake frame/chunk size

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_len", IntegerType()),
    ]
)


def decode_image(data: bytes) -> Any:
    """REAL decoder stub — requires an image library not in this
    container. Callers in production swap this for PIL/libvips; the
    pipeline shape is independent of the codec."""
    raise NotImplementedError(
        "image codec not available in this environment; use fake_decode_meta "
        "for plumbing tests"
    )


def fake_decode_meta(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for codec metadata: (width, height,
    n_frames) as pure integer functions of the byte length, so the
    DuckDB oracle reproduces them from octet_length."""
    n = len(data)
    width = n % 640 + 16
    height = (n * 7) % 480 + 16
    n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
    return width, height, n_frames


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, payload binary).

    Payload bytes are ``encode(text)`` — a deterministic stand-in for
    real media blobs (TESTDATA has no binary table); everything
    downstream treats them as opaque bytes.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: Arrow-batched, streaming.

    One call per Arrow batch (not per row); the iterator contract means
    Spark never holds a whole partition of media bytes in python memory.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf["payload"].map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": metas.map(lambda m: m[0]),
                    "height": metas.map(lambda m: m[1]),
                    "n_frames": metas.map(lambda m: m[2]),
                }
            )

    return media.mapInPandas(_batches, schema=MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Chunk each payload into fixed-size frames (video frame-sampling
    shape): one output row per chunk, bytes preserved."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload), frame_bytes):
                    chunk = payload[i : i + frame_bytes]
                    rows.append((doc_id, i // frame_bytes, chunk, len(chunk)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame", "frame_len"]
            )

    return media.mapInPandas(_batches, schema=FRAME_SCHEMA)


@register(
    "media_meta_stats",
    plan=("arrow",),
    oracle=f"""
    WITH media AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               octet_length(encode(text)) AS n
        FROM documents
    )
    SELECT media_type,
           count(*) AS n_media,
           CAST(sum(n) AS BIGINT) AS total_bytes,
           min(n % 640 + 16) AS min_width,
           max((n * 7) % 480 + 16) AS max_height,
           CAST(sum(CAST((n + {FRAME_BYTES} - 1) // {FRAME_BYTES} AS BIGINT)) AS BIGINT) AS total_frames
    FROM media GROUP BY media_type
    """,
    doc="multimodal: binary payload + mapInPandas fake-decode metadata, "
    "aggregated per media_type (oracle reproduces decode arithmetic)",
)
def media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = extract_media_meta(media_table(spark, sf_dir))
    return meta.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
        F.sum("n_frames").cast("long").alias("total_frames"),
    )


@register(
    "media_frame_sample",
    plan=("arrow",),
    oracle=f"""
    WITH media AS (
        SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    )
    SELECT doc_id,
           CAST((n + {FRAME_BYTES} - 1) // {FRAME_BYTES} AS BIGINT) AS n_frames,
           CAST(n - (CAST((n + {FRAME_BYTES} - 1) // {FRAME_BYTES} AS BIGINT) - 1)
                * {FRAME_BYTES} AS BIGINT) AS last_frame_len
    FROM media
    """,
    doc="multimodal: mapInPandas frame chunking — per-doc frame count and "
    "tail-frame size (verifies the explosion preserved every byte)",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(media_table(spark, sf_dir))
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.max_by("frame_len", "frame_idx").cast("long").alias("last_frame_len"),
    )


# --------------------------------------------------------------------------
# Resize + feature extraction — the remaining two stages of the
# decode → feature-extract → resize → frame-sample quartet. Codec-free
# deterministic stand-ins (strided byte subsample; byte-bucket
# histogram) keep the Arrow plumbing oracle-checkable: payload bytes are
# UTF-8 of ASCII text, so DuckDB reproduces every byte via ascii().
# --------------------------------------------------------------------------
RESIZE_W = 32
RESIZE_H = 32
_RESIZE_TARGET = RESIZE_W * RESIZE_H  # 1024-byte fake thumbnail
N_FEATURES = 8

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("orig_bytes", LongType()),
        StructField("resized", BinaryType()),
        StructField("resized_len", LongType()),
        StructField("checksum", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("media_type", StringType())]
    + [StructField(f"f{b}", LongType()) for b in range(N_FEATURES)]
)


def fake_resize(data: bytes, target: int = _RESIZE_TARGET) -> bytes:
    """Deterministic stand-in for a thumbnail resize: every k-th byte,
    k = max(1, n // target), truncated to target bytes. Production swaps
    in PIL `Image.resize` behind the same signature; the Spark-side
    schema/batching is what this verifies."""
    k = max(1, len(data) // target)
    return data[::k][:target]


def resize_media(media: DataFrame) -> DataFrame:
    """mapInPandas resize: Arrow-batched, output carries the resized
    binary plus integrity metadata (length + additive byte checksum)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_bytes": pdf["payload"].map(len),
                    "resized": resized,
                    "resized_len": resized.map(len),
                    "checksum": resized.map(lambda b: sum(b)),
                }
            )

    return media.mapInPandas(_batches, schema=RESIZED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: an 8-bucket byte-value histogram
    per payload (stand-in for an image/audio embedding head — numpy
    vectorized per Arrow batch, exact integer counts)."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hists = pdf["payload"].map(
                lambda b: np.bincount(
                    np.frombuffer(b, dtype=np.uint8) % N_FEATURES,
                    minlength=N_FEATURES,
                )
            )
            out = {"doc_id": pdf["doc_id"], "media_type": pdf["media_type"]}
            for b in range(N_FEATURES):
                out[f"f{b}"] = hists.map(lambda h, b=b: int(h[b]))
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, schema=FEATURES_SCHEMA)


@register(
    "media_resize_stats",
    plan=("arrow",),
    oracle=f"""
    WITH media AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               text, octet_length(encode(text)) AS n
        FROM documents
    ),
    r AS (
        SELECT doc_id, media_type, n,
               greatest(1, n // {_RESIZE_TARGET}) AS k
        FROM media
    ),
    m AS (
        SELECT doc_id, media_type, n, k,
               least({_RESIZE_TARGET}, CAST(ceil(CAST(n AS DOUBLE) / k) AS BIGINT)) AS m_len
        FROM r
    )
    SELECT media_type,
           count(*) AS n_media,
           CAST(sum(m_len) AS BIGINT) AS total_resized_bytes,
           CAST(sum((
               SELECT CAST(sum(ascii(text[1 + j_.j * k])) AS BIGINT)
               FROM unnest(range(0, m_len)) AS j_(j)
           )) AS BIGINT) AS total_checksum
    FROM m, documents d
    WHERE m.doc_id = d.doc_id
    GROUP BY media_type
    """,
    doc="multimodal resize: mapInPandas strided-subsample thumbnail with "
    "length + additive checksum integrity metadata, aggregated per "
    "media_type (oracle replays the stride arithmetic byte-for-byte)",
)
def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = resize_media(media_table(spark, sf_dir))
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("resized_len").alias("total_resized_bytes"),
        F.sum("checksum").alias("total_checksum"),
    )


@register(
    "media_feature_extract",
    plan=("arrow",),
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           {", ".join(
               f"CAST(len(list_filter(range(1, octet_length(encode(text)) + 1), "
               f"i_ -> ascii(text[i_]) % {N_FEATURES} = {b})) AS BIGINT) AS f{b}"
               for b in range(N_FEATURES)
           )}
    FROM documents
    """,
    doc="multimodal feature extraction: numpy byte-histogram head over "
    "Arrow batches (8 exact integer counts per payload) — the "
    "embedding-head plumbing with a codec-free deterministic kernel",
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_table(spark, sf_dir))
