"""Group A — scans / sources / sinks (SURVEY §2.3 A).

pg2ch parity: R1 snapshot scan (`pkg/replicator` COPY snapshot), R2 WAL
change source (`pkg/consumer`), R12 sink (`pkg/utils/chutils` HTTP
insert) — re-expressed as parquet scans, a Structured Streaming file
source replay, and a parquet sink round-trip.

Scale notes:
- ``scan_pruned_pushdown`` exists to prove the plan, not the rows: the
  projection and predicate must reach the parquet reader (ReadSchema /
  PushedFilters) so a 100 TB scan touches only the needed column chunks
  and row groups. Verified in tests/test_plans.py.
- ``source_snapshot`` unions per-table count aggregates — an all-
  map-side plan (parquet count pushdown), no driver-side .count() loop.
- ``source_cdc_replay`` replays the events table through the file
  stream source with an ``availableNow`` trigger — the exact analog of
  pg2ch's snapshot→stream handoff, with the checkpoint dir playing the
  role of pg2ch's kvstorage LSN tracking (R13).
"""

from __future__ import annotations

import functools
import operator as _op
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


@register(
    "scan_parquet",
    oracle="SELECT * FROM nation",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns (R1 snapshot of a dimension table)."""
    return catalog.load(spark, sf_dir, "nation")


@register(
    "scan_pruned_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def scan_pruned_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan of the fact table."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return li.where(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def _snapshot_oracle() -> str:
    parts = [
        f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}" for t in catalog.TABLES
    ]
    return "\nUNION ALL\n".join(parts)


@register("source_snapshot", oracle=_snapshot_oracle())
def source_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-source abstraction: row count per table.

    In production this is the JDBC snapshot path (pg2ch R1: COPY within
    a tx pinned at the slot LSN); locally parquet. Counts are computed
    as per-table aggregates and unioned — fully distributed, no
    driver-side loop.
    """
    counts = [
        catalog.load(spark, sf_dir, t)
        .groupBy(F.lit(t).alias("table_name"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        for t in catalog.TABLES
    ]
    return functools.reduce(DataFrame.unionByName, counts)


@register(
    "sink_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a filtered slice to a parquet sink, read it back (R12 analog)."""
    out = tempfile.mkdtemp(prefix="pg2ch_sink_")
    shutil.rmtree(out, ignore_errors=True)
    (
        catalog.load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out)


@register(
    "source_cdc_replay",
    oracle="""
    SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch_s,
           user_id, event_type, value, props
    FROM events
    """,
)
def source_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay `events` as a stream (file source, availableNow) into a batch.

    pg2ch R2/R13: the change stream with offset tracking. The file
    stream source + checkpoint dir is the Spark-native equivalent of the
    replication slot + kvstorage LSN. ts is emitted as floor-epoch
    seconds (D3: never raw ns timestamps).
    """
    from pg2ch_spark.streaming.runner import replay_available_now

    schema = spark.read.parquet(catalog.table_path(sf_dir, "events")).schema

    def transform(df: DataFrame) -> DataFrame:
        # floor ts to epoch seconds whatever type it arrived as (D3)
        return df.select(
            "event_id",
            catalog.ts_epoch_s(df).alias("ts_epoch_s"),
            "user_id",
            "event_type",
            "value",
            "props",
        )

    return replay_available_now(
        spark, catalog.table_path(sf_dir, "events"), schema, transform
    )


@register(
    "source_pyds_tsv",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(length(text) + 3) AS BIGINT) AS chars_total,
           CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_lang,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents GROUP BY source
    """,
)
def source_pyds_tsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-TabSeparated sink → PYTHON DATA SOURCE re-read
    (`sources/pyds.py`, the public `pyspark.sql.datasource` plugin API
    of Spark 4) — under the hash gate WITH hostile payloads.

    Every document's text gains a raw TAB + BACKSLASH + NEWLINE suffix
    and every 7th lang becomes NULL before encoding, so the dialect's
    escape rules (``\\t`` ``\\\\`` ``\\n``, ``\\N`` nulls) are load-
    bearing: Spark's built-in CSV reader CANNOT parse this file back
    (CSV quotes, it never character-escapes), which is exactly why the
    dialect needs a custom source. The oracle aggregates the original
    parquet plus the same injected transform, so one mis-unescaped
    byte or a lost null breaks the hash. Parallelism: the encode is a
    per-partition mapInPandas, the sink one part file per task, the
    re-read one InputPartition per part — distributed both directions,
    no inference pass (declared schema only).
    """
    import shutil

    import pandas as pd

    from pg2ch_spark.sources import pyds
    from pg2ch_spark.sources.clickhouse import encode_row
    from pg2ch_spark.streaming.runner import scratch_dir

    docs = catalog.load(spark, sf_dir, "documents")
    hostile = docs.select(
        "doc_id",
        F.concat("text", F.lit("\t\\\n")).alias("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "source",
    )

    def enc(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"line": [encode_row(row) for row in pdf.itertuples(index=False)]}
            )

    base = scratch_dir("pg2ch_pyds_")
    out = base + "/tsv"
    hostile.mapInPandas(enc, "line string").write.mode("overwrite").text(out)
    pyds.register(spark)
    back = (
        spark.read.format("clickhouse_tsv")
        .schema("doc_id bigint, text string, lang string, source string")
        .option("path", out)
        .load()
    )
    res = (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("chars_total"),
            F.sum(F.col("lang").isNull().cast("int")).cast("bigint").alias("n_null_lang"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return res
