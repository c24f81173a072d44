"""Table catalog: load the ten test tables with normalized schemas.

pg2ch's analog is its YAML table registry + the pgoutput Relation
message (fixed, declared schemas — SURVEY §1.1). We do the same: the
schema comes from the parquet footer (declared, never inferred from
data) and every consumer goes through :func:`load` so normalization
happens in exactly one place.

Normalizations:
- ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark 4
  refuses outright (PARQUET_TYPE_ILLEGAL). We flip the runtime conf
  ``spark.sql.legacy.parquet.nanosAsLong`` and rebuild a proper
  microsecond TimestampType column with integer division (``div`` — a
  float division would lose precision: ns-since-epoch ≈ 1.7e18 exceeds
  a double's 53-bit mantissa).
- Session timezone pinned to UTC so date/epoch functions agree with the
  DuckDB oracle's timezone-naive timestamps.

Scale note: loads are plain ``spark.read.parquet`` — columnar scan,
predicate pushdown and column pruning all come free from Catalyst, and
a directory of parquet parts at 100 TB behaves identically to the
single-file test fixtures.
"""

from __future__ import annotations

import os
import weakref

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def configure(spark: SparkSession) -> None:
    """Apply runtime confs this engine depends on.

    Safe to call repeatedly; applied per-query because the driver owns
    the session (``__spark_entry__`` contract).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass  # static in some builds; Arrow is an optimization, not a requirement


def tune(spark: SparkSession) -> None:
    """Apply perf confs to whatever session the driver hands us.

    Both are runtime-settable SQL confs, so they must not live only in
    our own session factory (session.py) — under a vanilla driver
    session the ~15 MB local fixtures split into 1-3 input partitions
    (128 MB default) and 3 of 32 cores do all the work. 4 MB splits
    restore parallelism locally; on a real cluster with TB inputs,
    override via env back to the default.

    Called once per query by the registry wrapper, BEFORE the query
    body runs — never from :func:`load` — so queries that temporarily
    override the shuffle width (streaming state-partition sizing) are
    not clobbered by a mid-body table load.
    """
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ts_epoch_s(df: DataFrame) -> "F.Column":
    """Whole-second epoch for ``events.ts`` regardless of arrival type.

    bigint-ns builds (nanosAsLong honored) floor by integer division;
    timestamp/NTZ builds cast through TimestampType (ANSI allows
    ts->long, not ntz->long; UTC session makes the NTZ cast exact).
    Both floor toward zero, matching the oracle's floor(epoch(ts)).
    """
    if dict(df.dtypes).get("ts") == "bigint":
        return F.expr("ts div 1000000000")
    return F.col("ts").cast("timestamp").cast("long")


# DataFrames are immutable logical plans — reusing one across queries is
# safe, and skips the ~50 ms file-listing + footer-schema round-trip
# that spark.read.parquet pays per call (the fixtures never change
# underneath us; physical planning still re-reads session confs per
# action). Keyed weakly by session so a stopped session's plans die.
_LOAD_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with normalized schema (memoized per session)."""
    global _LOAD_CACHE
    if _LOAD_CACHE is None:
        _LOAD_CACHE = weakref.WeakKeyDictionary()
    try:
        per_session = _LOAD_CACHE.setdefault(spark, {})
    except TypeError:  # session not weakref-able in some builds
        per_session = {}
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is None:
        configure(spark)
        df = spark.read.parquet(table_path(sf_dir, name))
        if name == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                # ns since epoch -> µs TimestampType (integer division, no float)
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type == "timestamp_ntz":
                # Some Spark 4 builds map parquet TIMESTAMP(NANOS) straight
                # to TIMESTAMP_NTZ (ns truncated to µs) instead of honoring
                # nanosAsLong. Under a UTC session the NTZ->TIMESTAMP cast
                # is value-exact, and TimestampType (unlike NTZ) supports
                # the numeric epoch casts (ANSI allows ts->long, not
                # ntz->long) every downstream epoch-second query uses.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        per_session[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
