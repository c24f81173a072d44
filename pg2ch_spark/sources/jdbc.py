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


def snapshot_options(snapshot_name: str) -> dict[str, str]:
    """JDBC options pinning every partition's read transaction to one
    exported snapshot (`SET TRANSACTION SNAPSHOT` runs per connection
    via sessionInitStatement) — the consistency half of the R1→R2
    handoff. Pair with the LSN returned by
    ``WalSenderClient.create_slot`` (the other half)."""
    if "'" in snapshot_name:  # snapshot names are server-generated; be safe
        raise ValueError(f"invalid snapshot name: {snapshot_name!r}")
    return {"sessionInitStatement": f"SET TRANSACTION SNAPSHOT '{snapshot_name}'"}


def bootstrap_replication(
    client,
    spark: SparkSession,
    url: str,
    tables: dict[str, dict],
    *,
    slot: str,
    plugin: str = "pgoutput",
    sync=None,
    **common,
):
    """The executable R1→R2 gapless handoff (pg2ch `pkg/replicator`
    startup): CREATE the slot (exporting a snapshot), build every
    table's partitioned JDBC reader PINNED to that snapshot, and return
    ``(slot_info, frames)``. The caller materializes the frames
    (initial sync), then calls ``client.start_replication(slot, pub,
    start_lsn=slot_info.consistent_point)`` ON THE SAME CLIENT — the
    exported snapshot is session-scoped, which is why this takes a
    connected ``WalSenderClient`` rather than making its own.

    ``sync`` defaults to :func:`snapshot_all` (the real JDBC reader
    set); tests inject a fake with the same signature to run the
    handoff e2e against the scripted walsender without a live
    PostgreSQL — the slot/snapshot/LSN choreography under test is
    identical either way.
    """
    info = client.create_slot(slot, plugin=plugin, export_snapshot=True)
    if info.snapshot_name is None:
        raise ValueError(
            f"slot {slot!r} exported no snapshot (temporary slot or "
            "NOEXPORT option?) — gapless handoff needs one"
        )
    pin = snapshot_options(info.snapshot_name)
    # The snapshot pin must survive every options-merge path: a caller
    # (or per-table kwargs, which replace the shared options dict
    # wholesale in snapshot_all's {**common, **kw}) silently overriding
    # sessionInitStatement would un-anchor the sync from the slot's
    # consistent point — the exact bug this function exists to prevent.
    for where, block in (
        ("options", common.get("options", {})),
        *((f"tables[{n!r}].options", kw.get("options", {})) for n, kw in tables.items()),
    ):
        if "sessionInitStatement" in block:
            raise ValueError(
                f"{where} sets sessionInitStatement, which would replace "
                "the exported-snapshot pin; bootstrap_replication owns it"
            )
    opts = {**pin, **common.pop("options", {})}
    tables = {
        n: {**kw, "options": {**opts, **kw.get("options", {})}}
        for n, kw in tables.items()
    }
    frames = (sync or snapshot_all)(spark, url, tables, options=opts, **common)
    return info, frames


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
