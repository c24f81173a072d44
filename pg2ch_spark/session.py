"""SparkSession factory.

The driver may hand us an arbitrary session, so anything correctness-
critical must be a *runtime* conf applied per-query (see
``catalog.configure``). This factory is for tests/bench where we own the
session.

Scale notes (100 TB design intent):
- AQE on: runtime partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion are what keep a static plan honest at
  1000 executors.
- ``spark.sql.shuffle.partitions`` is pinned small for local[32]; on a
  real cluster AQE's ``advisoryPartitionSizeInBytes`` takes over and the
  initial number should be ~2-3x total cores.
- Arrow enabled so the pandas-UDF surface (SURVEY §2.3 L) and driver
  collects use columnar transfer instead of pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "pg2ch-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = default_parallelism()
    if shuffle_partitions is None:
        # AQE coalesces DOWN from this, never up — so for scale probes
        # (1000× replication = 150M-row shuffles) it must be raised to
        # keep sort partitions inside executor memory, same as a real
        # cluster sizes the initial count to data volume, not cores.
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Local-scale parallelism: the sf0.1 fixtures are ~15 MB files, which
        # the 128 MB default splits into ~3 input partitions — 3 of 32 cores
        # busy. 4 MB splits restore parallelism for local bench; on a real
        # cluster with TB-scale inputs the default is correct and this knob
        # should be left alone (override via SPARK_GRAFT_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # FIFO by default (single-workload batch posture). Multi-query
        # servers set FAIR so a many-small-jobs chain (an iterative
        # fixpoint, a bucketed flush) is not serialized behind every
        # wide job ahead of it in the queue — the bench's concurrent
        # pass measures exactly that workload and sets this to FAIR.
        .config("spark.scheduler.mode", os.environ.get("SPARK_GRAFT_SCHEDULER", "FIFO"))
    )
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    return builder.getOrCreate()
