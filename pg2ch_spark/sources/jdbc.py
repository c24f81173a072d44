"""PostgreSQL snapshot source — the Spark analog of pg2ch's initial
table sync (SURVEY §2.1 R1: `COPY table TO STDOUT` pinned at the
replication slot's consistent LSN).

pg2ch streams one COPY per table through a single Go process; Spark's
JDBC source does the same logically but *partitioned*: N executors each
read a key-range slice, so the snapshot parallelizes with the cluster
instead of being bounded by one connection. At 100 TB this is the
difference between hours and days — size `num_partitions` to the
cluster's total cores and let predicate pushdown turn each partition
into an indexed range scan on the source.

Consistency: pg2ch pins the COPY inside a repeatable-read transaction
at the slot LSN. Partitioned JDBC reads use one transaction per
partition, so a moving source would skew slices; the prod recipe is the
same as pg2ch's — create the replication slot FIRST (exporting a
snapshot name), then pass ``options={"sessionInitStatement": "SET
TRANSACTION SNAPSHOT '<name>'"}`` so every partition reads the exact
snapshot the slot was created at, and start the change stream from the
slot's LSN afterwards (handoff semantics = `cdc_snapshot_handoff`).

No live PostgreSQL exists in this container; the function builds and
returns the reader unexecuted, so it is import- and plan-testable
offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC snapshot of one table.

    ``partition_column`` must be an indexed, roughly-uniform numeric
    key (the primary key pg2ch requires via REPLICA IDENTITY works).
    Without it the read degrades to a single partition — correct, but
    single-connection, like the reference.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned snapshot needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def snapshot_all(
    spark: SparkSession,
    url: str,
    tables: dict[str, dict],
    **common,
) -> dict[str, DataFrame]:
    """Snapshot a configured table set (pg2ch's YAML table list analog:
    SURVEY §2.1 R14). ``tables`` maps table name → per-table kwargs for
    :func:`snapshot` (partition bounds differ per table)."""
    return {
        name: snapshot(spark, url, name, **{**common, **kw}) for name, kw in tables.items()
    }
