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
import math
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pg2ch_spark.caching import fanout_partitions
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
        # brightness walks the first 16 CHARACTERS like the oracle's
        # ord(substr(text, i, 1)) — codepoints, not bytes (identical on
        # ASCII payloads) — with DuckDB's edge semantics on short
        # strings: ord('') is -1 and integer % keeps the dividend sign
        chars = payload.decode("utf-8")
        s = sum(ord(chars[i]) if i < len(chars) else -1 for i in range(16))
        return (n % 640 + 16, (n * 7) % 480 + 16, int(math.fmod(s, 256)))

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


# ---------------------------------------------------------------------------
# Audio windowing (round 4): overlapping fixed-length analysis windows
# over a PCM payload — the STFT-framing layout step (win 25 ms, hop
# 10 ms at the declared 8 kHz ≙ 200/80 samples at 1 byte/sample).

_AUD_WIN = 200
_AUD_HOP = 80
_AUD_MS_PER_HOP = 10
_AUD_MS_PER_WIN = 25


@register(
    "multimodal_audio_windows",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, text, strlen(text) AS n_samples
        FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id, CAST(k AS INT) AS win_idx,
           CAST(k * {_AUD_MS_PER_HOP} AS BIGINT) AS start_ms,
           CAST(k * {_AUD_MS_PER_HOP} + {_AUD_MS_PER_WIN} AS BIGINT) AS end_ms,
           md5(substr(text, k * {_AUD_HOP} + 1, {_AUD_WIN})) AS win_hash
    FROM media, unnest(range(0,
         -- n >= W guard BEFORE the division: DuckDB's // truncates
         -- toward zero while the Spark side's Python // floors, so the
         -- negative (sub-window) branch must never reach the division
         CASE WHEN n_samples >= {_AUD_WIN}
              THEN (n_samples - {_AUD_WIN}) // {_AUD_HOP} + 1 ELSE 0 END))
         AS t(k)
    """,
)
def multimodal_audio_windows(spark, sf_dir: str) -> DataFrame:
    """Audio analysis-window plumbing: each payload expands to its
    OVERLAPPING 25 ms windows at a 10 ms hop (the STFT/feature-frame
    layout every speech pipeline runs) inside mapInPandas — the
    counterpart of `multimodal_framesample`'s strided, non-overlapping
    video sampling. Window COUNT math (1 + ⌊(n−W)/H⌋, zero for
    sub-window clips) and per-window start/end timestamps are the
    audio-specific semantics under test; the window "decode" is the
    documented md5 fake (no audio codec in this container —
    multimodal.decode_image's contract), so alignment is exactly
    oracle-checked, not row-counted.

    Scale: the expansion runs where the payload lives; a window row
    carries 16 hash bytes + 3 longs, so the 2.5× sample-overlap factor
    applies to hashes, never to payload bytes on the wire.
    """
    import hashlib

    import pandas as pd
    import pyspark.sql.functions as F

    from pg2ch_spark import catalog

    docs = catalog.load(spark, sf_dir, "documents")
    media = docs.where(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )

    def windows(batches):
        for pdf in batches:
            ids, idxs, starts, ends, hashes = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw)
                # window COUNT is byte-derived on both sides; window
                # CONTENT walks characters like the oracle's substr
                # (identical on ASCII, aligned on any UTF-8 payload)
                chars = raw.decode("utf-8")
                for k in range(max((n - _AUD_WIN) // _AUD_HOP + 1, 0)):
                    ids.append(mid)
                    idxs.append(k)
                    starts.append(k * _AUD_MS_PER_HOP)
                    ends.append(k * _AUD_MS_PER_HOP + _AUD_MS_PER_WIN)
                    hashes.append(
                        hashlib.md5(
                            chars[k * _AUD_HOP : k * _AUD_HOP + _AUD_WIN]
                            .encode("utf-8")
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "win_idx": idxs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "win_hash": hashes,
                }
            )

    return media.repartition(fanout_partitions(media)).mapInPandas(
        windows,
        "media_id long, win_idx int, start_ms long, end_ms long, win_hash string",
    )


# ---------------------------------------------------------------------------
# Resize (round 4): the remaining member of the decode / extract /
# resize / frame-sample quartet — aspect-preserving target geometry +
# a deterministic strided-resample fake where a real scaler would run.

_FIT_BOX = 224  # fit-within box (the ubiquitous vision-model input)
_RS_MAX_BYTES = 64  # fake resample keeps <= 64 strided payload bytes


@register(
    "multimodal_resize",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, text, strlen(text) AS n,
               CAST(strlen(text) % 640 + 16 AS INTEGER) AS width,
               CAST((strlen(text) * 7) % 480 + 16 AS INTEGER) AS height
        FROM documents WHERE doc_id % 3 = 0
    ), geom AS (
        SELECT media_id, text, n, width, height,
               greatest(width, height) AS m
        FROM media
    ), sized AS (
        SELECT media_id, text, n, width, height,
               CASE WHEN m <= {_FIT_BOX} THEN width
                    ELSE greatest((width * {_FIT_BOX}) // m, 1) END AS new_w,
               CASE WHEN m <= {_FIT_BOX} THEN height
                    ELSE greatest((height * {_FIT_BOX}) // m, 1) END AS new_h,
               greatest(n // {_RS_MAX_BYTES}, 1) AS stride
        FROM geom
    )
    SELECT media_id, width, height, new_w, new_h,
           CAST(stride AS BIGINT) AS stride,
           md5(array_to_string(list_transform(
               range(0, (n + stride - 1) // stride),
               j -> substr(text, 1 + j * stride, 1)), '')) AS resized_hash
    FROM sized ORDER BY media_id
    """,
)
def multimodal_resize(spark, sf_dir: str) -> DataFrame:
    """Resize stage of the multimodal quartet (decode → extract →
    RESIZE → frame-sample): aspect-preserving fit into the
    {_FIT_BOX}×{_FIT_BOX} model input box (integer floor math — never
    upscale, floor at 1 px) plus the resample itself as a
    deterministic strided-byte fake (a real scaler is stubbed per the
    `decode_image` contract — no image libs in this container). The
    target-geometry arithmetic is pure integer in BOTH engines, and
    the fake resample's selection (every stride-th CHARACTER of the
    UTF-8 payload — character-strided like the oracle's substr, while
    geometry stays byte-derived; the two only differ on non-ASCII
    payloads — stride = max(n // {_RS_MAX_BYTES}, 1)) is hash-checked, so the
    mapInPandas plumbing — payload through Arrow, row alignment,
    output schema — is exactly verified, not row-counted.

    Scale: geometry math never touches the payload (column pruning
    keeps it out of any metadata-only consumer); the resample runs
    where the payload lives via mapInPandas and ships back 16 hash
    bytes + 5 ints per image, never resized bytes on the wire unless
    a sink asks for them.
    """
    import hashlib

    import pandas as pd
    import pyspark.sql.functions as F

    from pg2ch_spark import catalog

    docs = catalog.load(spark, sf_dir, "documents")
    media = docs.where(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )

    def resize(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "new_w", "new_h", "stride",
                "resized_hash",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw)
                w, h = n % 640 + 16, (n * 7) % 480 + 16
                m = max(w, h)
                if m <= _FIT_BOX:
                    nw, nh = w, h
                else:
                    nw = max((w * _FIT_BOX) // m, 1)
                    nh = max((h * _FIT_BOX) // m, 1)
                stride = max(n // _RS_MAX_BYTES, 1)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["new_w"].append(nw)
                out["new_h"].append(nh)
                out["stride"].append(stride)
                # character stride, not raw[::stride]: the oracle's
                # substr(text, 1 + j*stride, 1) walks CHARACTERS, and
                # byte positions diverge from char positions on any
                # multi-byte payload (geometry above stays byte-based
                # on both sides)
                out["resized_hash"].append(
                    hashlib.md5(
                        raw.decode("utf-8")[::stride].encode("utf-8")
                    ).hexdigest()
                )
            yield pd.DataFrame(out)

    return (
        media.repartition(fanout_partitions(media))
        .mapInPandas(
            resize,
            "media_id long, width int, height int, new_w int, new_h int, "
            "stride long, resized_hash string",
        )
        .orderBy("media_id")
    )
