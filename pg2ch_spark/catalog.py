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


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with normalized schema."""
    configure(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns since epoch -> µs TimestampType (integer division, no float)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
