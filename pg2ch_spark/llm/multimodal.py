"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct — the 100 TB pattern: never decode in SQL, keep
payloads opaque through shuffles, and run decode/feature-extraction as
Arrow-batched ``mapInPandas`` stages sized by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The decode step itself is STUBBED (image/audio libraries are not in
this container): ``decode_image`` raises NotImplementedError unless a
``decoder`` callable is injected; tests inject a deterministic fake.
The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested (tests/test_multimodal.py).

Scale notes:
- payload column is pruned away unless a stage actually touches it
  (column pruning — verified in the tests by reading only metadata).
- ``frame_sample`` style row expansion happens inside mapInPandas so
  one input batch yields one output frame (no per-row Python).
- partitioning: repartition by a content-size bucket before decode so
  Arrow batches have bounded byte size, not just bounded row count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pg2ch_spark.registry import register
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
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) — stands in
    for a real binary-file source (`spark.read.format('binaryFile')`)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4  # 128 bytes
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                1000 * i if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Real decode requires an image library not present here (brief:
    stub behind NotImplementedError; tests inject a fake)."""
    raise NotImplementedError(
        "image decoding requires an image library (PIL/cv2) not present "
        "in this container — inject a decoder into extract_features()"
    )


def extract_features(
    media: DataFrame,
    *,
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads.

    ``decoder(payload_bytes) -> list[float]`` is injected; defaults to
    the NotImplementedError stub. The mapInPandas plumbing (schema,
    batching, row alignment) is identical for a real decoder.
    """
    dec = decoder if decoder is not None else (lambda b: decode_image(b))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(bytes(p))[:feature_dim] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    # bound batch byte-size, not just row count: bucket by payload length
    bucketed = media.repartition(F.spark_partition_id(), F.length("payload"))
    return bucketed.mapInPandas(run, FEATURE_SCHEMA)


def metadata_only(media: DataFrame) -> DataFrame:
    """Metadata projection — must NOT read payload bytes (column pruning);
    asserted in tests via the physical plan."""
    return media.select("media_id", "kind", "mime", "width", "height", "duration_ms")


# ---------------------------------------------------------------------------
# Declared query: the full multimodal plumbing under a differential check.
# The "decode" is a deterministic fake (the real one is stubbed — no image
# libs in this container), which makes the mapInPandas path EXACTLY
# checkable: the DuckDB oracle computes the same formulas in SQL.

_EXTRACT_SCHEMA = "media_id long, kind string, n_bytes long, width int, height int, brightness int"


@register(
    "multimodal_extract",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           strlen(text) AS n_bytes,
           CAST(strlen(text) % 640 + 16 AS INTEGER) AS width,
           CAST((strlen(text) * 7) % 480 + 16 AS INTEGER) AS height,
           CAST(list_sum(list_transform(range(1, 17), i -> ord(substr(text, i, 1)))) % 256
                AS INTEGER) AS brightness
    FROM documents
    """,
)
def multimodal_extract(spark, sf_dir: str) -> DataFrame:
    """Opaque-binary decode/feature-extract over mapInPandas (Arrow
    batches). Payloads are the documents' bytes carried as a `binary`
    column; the decoder is a deterministic fake standing in for a real
    image decode (stubbed per brief — see `decode_image`). The
    plumbing under test — binary column through a repartition, Arrow
    batch shape, UDF signature, row alignment — is exactly what a real
    decoder needs; the oracle recomputes the fake's arithmetic in SQL,
    so the whole Python path is hash-checked, not just row-counted.
    """
    from pg2ch_spark import catalog

    docs = catalog.load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )

    def fake_decode(payload: bytes) -> tuple[int, int, int]:
        n = len(payload)
        return (n % 640 + 16, (n * 7) % 480 + 16, sum(payload[:16]) % 256)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "brightness": [d[2] for d in decoded],
                }
            )

    # same batch-size-bounding repartition as extract_features
    bucketed = media.repartition(F.spark_partition_id(), F.length("payload"))
    return bucketed.mapInPandas(run, _EXTRACT_SCHEMA)
