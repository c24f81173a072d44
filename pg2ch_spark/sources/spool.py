"""WAL spool — the landing zone between the walsender client and the
Spark pipeline (composes SURVEY §2.1 R2/R3 with R5-R9/R13).

pg2ch couples its consumer directly to its in-process buffers; a Spark
replica decouples them with files, because the protocol client is
inherently a single connection (one walsender session per slot) while
the apply side is a cluster. The spool is that boundary, built so the
at-least-once stream composes into exactly-once state:

- **One file per committed transaction**, named by commit LSN
  (``cdc-<lsn:016x>.parquet``). A replayed transaction (crash before
  ack) rewrites the SAME file with the SAME bytes — commit LSNs are
  immutable identities — and Spark's file-source offset log tracks
  files by name, so the pipeline never double-applies a replay. The
  dedup lives in the naming, not in fragile consumer state.
- **Atomic publish**: rows are written to a dot-prefixed temp name
  (invisible to Spark's directory listing, which skips ``.``/``_``
  files) and ``os.replace``d into place — a reader never lists a
  partially-written transaction.
- **Durable-then-ack**: the generator yields only after the file is
  on disk, and ``replication_stream`` acks the LSN only when the
  consumer RESUMES — so the standby status update reaching the server
  implies the transaction is already spooled. A crash between the two
  replays the transaction into the same file name (harmless).

The spool writer runs driver-side on purpose: it IS the protocol
client's thread (pg2ch's consumer is equally single-process); volume
is bounded by one slot's WAL bandwidth, not table size, and the Spark
side fans out from the files with full parallelism.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Iterator

from pg2ch_spark.sources.pgoutput import CdcRow


def default_row(r: CdcRow) -> dict:
    """CdcRow → the pipeline's normalized CDC shape: generic single
    key/value tables (the fixture contract of `derive_cdc_stream`).
    Real deployments pass a per-table mapper (the R4 route step) that
    knows the replicated schema.

    Op coverage matters here, not just inserts: a DELETE carries its
    key in ``old_key`` (``values`` is empty — pgoutput sends only the
    replica identity), and a TRUNCATE is relation-level with NO key at
    all (key stays NULL; propagating it is the sink's R10 decision).
    The first implementation indexed ``values[0]`` and crashed on the
    first delete through the composed chain."""
    vals = list(r.values.values())
    if vals:
        key = int(vals[0])
    elif r.old_key:
        key = int(next(iter(r.old_key.values())))
    else:  # truncate: relation-level marker
        key = None
    return {
        # the R4 routing key: each TableSpec consumes only its own
        # relation's rows, so a TRUNCATE of table a (a relation-SCOPED
        # wire message — Truncate.rel_oids) can never wipe table b
        "table": r.relation,
        "key": key,
        "ver": r.scalar_ver,
        "op": r.op,
        "value": float(vals[1]) if len(vals) > 1 and vals[1] is not None else None,
    }


def spool_transactions(
    stream: Iterable[tuple[int, list[CdcRow]]],
    spool_dir: str,
    *,
    to_row: Callable[[CdcRow], dict] = default_row,
    table: str = "cdc",
) -> Iterator[tuple[int, str]]:
    """Land each committed transaction as one parquet file; yield
    (commit_lsn, path) AFTER the file is durable. Driving this with
    ``replication_stream`` gives flush-then-ack through the spool:
    the inner generator acks an LSN only when this one is resumed,
    i.e. only after its file was atomically published."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(spool_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("table", pa.string()),
            ("key", pa.int64()),
            ("ver", pa.int64()),
            ("op", pa.string()),
            ("value", pa.float64()),
        ]
    )
    try:
        for commit_lsn, rows in stream:
            name = f"{table}-{commit_lsn:016x}.parquet"
            path = os.path.join(spool_dir, name)
            tmp = os.path.join(spool_dir, f".{name}.tmp")
            pdf = pd.DataFrame([to_row(r) for r in rows])
            pq.write_table(
                pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), tmp
            )
            os.replace(tmp, path)  # atomic: readers never list a partial file
            yield commit_lsn, path
    finally:
        # tear the protocol client down WITH the spool (a dying spool
        # is a dying consumer: close the socket now — deterministically,
        # not at GC — so the unacked tail replays on reconnect)
        close = getattr(stream, "close", None)
        if close is not None:
            close()
