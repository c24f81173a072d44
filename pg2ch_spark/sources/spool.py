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

from pg2ch_spark.sources.pgoutput import UNCHANGED, CdcRow


def default_rows(r: CdcRow) -> list[dict]:
    """CdcRow → zero or more rows of the pipeline's normalized CDC
    shape: generic single key/value tables (the fixture contract of
    `derive_cdc_stream`). Real deployments pass a per-table mapper
    (the R4 route step) that knows the replicated schema.

    Full wire-surface coverage, not just inserts:

    - DELETE's key rides in ``old_key`` (``values`` is empty — pgoutput
      sends only the replica identity);
    - TRUNCATE is relation-level: NULL key, one 'T' marker row;
    - a KEY-CHANGING UPDATE (replica identity ≠ new key) splits into a
      tombstone on the OLD key plus the new row — mapping it to the
      new key alone would leave the old row live in every keyed sink
      forever;
    - a SAME-KEY TOAST-UNCHANGED payload ('u' kind: PostgreSQL did not
      resend the value) emits NOTHING: in the (key, value) shape the
      value is the whole payload, so the row is a no-op and shipping
      NULL would overwrite the real stored value on merge. (Wider
      schemas must resolve the marker against the prior version —
      `pgoutput.resolve_unchanged` — in their custom mapper.)
    - a KEY-CHANGING UPDATE whose payload is TOAST-UNCHANGED is NOT a
      no-op: the row MOVED. Dropping it would leave the vacated key
      live with its stale value forever. The old-key tombstone is
      always emitted, and the new key lands with the value resolved
      from the OLD tuple (replica identity FULL ships it — the same
      wire fact pg2ch's collapsing path relies on). If the old tuple
      does not carry the value (replica identity DEFAULT), the generic
      shape cannot resolve it and fails LOUDLY rather than landing
      NULL over real data.
    """
    vals = list(r.values.values())
    old_vals = list(r.old_key.values()) if r.old_key else []
    if vals:
        key = int(vals[0])
    elif old_vals:
        key = int(old_vals[0])
    else:  # truncate: relation-level marker
        key = None

    def row(key, op, value):
        return {
            # the R4 routing key: each TableSpec consumes only its own
            # relation's rows, so a TRUNCATE of table a (relation-SCOPED
            # on the wire — Truncate.rel_oids) can never wipe table b
            "table": r.relation,
            "key": key,
            "ver": r.scalar_ver,
            "op": op,
            "value": value,
        }

    payload = vals[1] if len(vals) > 1 else None
    old = int(old_vals[0]) if (r.op == "U" and old_vals) else None
    key_changed = old is not None and old != key
    if payload is UNCHANGED:
        if not key_changed:
            return []  # same-key no-op in the 2-column shape (docstring)
        # The row moved keys with its value unsent: resolve it from the
        # old tuple (replica identity FULL) — never from thin air.
        # old_full gates on the WIRE kind ('O'): under 'K' the old
        # tuple's non-key positions are NULL placeholders, not values.
        if not r.old_full or len(old_vals) < 2 or old_vals[1] is UNCHANGED:
            raise ValueError(
                "key-changing UPDATE with TOAST-unchanged value on "
                f"relation {r.relation!r} (old key {old}): the generic "
                "(key, value) mapper needs REPLICA IDENTITY FULL to "
                "resolve the moved value; configure a custom mapper or "
                "REPLICA IDENTITY FULL on the source table"
            )
        moved = old_vals[1]
        return [
            row(old, "D", None),  # tombstone the vacated key
            row(key, "U", float(moved) if moved is not None else None),
        ]
    value = float(payload) if payload is not None else None
    out = []
    if key_changed:
        out.append(row(old, "D", None))  # tombstone the vacated key
    out.append(row(key, r.op, value))
    return out


def _arrow_type(spark_ddl: str):
    """One Spark DDL type string → the pyarrow type the typed spool
    lands it as (the parquet column type Spark reads back losslessly)."""
    import pyarrow as pa

    t = spark_ddl.strip().lower()
    flat = {
        "bigint": pa.int64(), "long": pa.int64(),
        "int": pa.int32(), "integer": pa.int32(),
        "smallint": pa.int16(), "tinyint": pa.int8(),
        "double": pa.float64(), "float": pa.float32(),
        "boolean": pa.bool_(),
        "string": pa.string(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
        "binary": pa.binary(),
    }
    if t in flat:
        return flat[t]
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[len("decimal(") : -1].split(",")
        return pa.decimal128(int(p), int(s))
    if t.startswith("array<") and t.endswith(">"):
        return pa.list_(_arrow_type(t[len("array<") : -1]))
    raise ValueError(f"typed spool: unsupported Spark type {spark_ddl!r}")


def typed_spool_schema(key_col: str, key_type: str, columns: dict[str, str]):
    """pyarrow schema of a TYPED spool: the normalized envelope
    (table, key, ver, op) followed by one typed column per replicated
    value column — the per-table column map pg2ch carries in its YAML
    (SURVEY §1.2), applied at the landing zone so everything downstream
    of the spool is already typed (never stringly)."""
    import pyarrow as pa

    fields = [
        ("table", pa.string()),
        (key_col, _arrow_type(key_type)),
        ("ver", pa.int64()),
        ("op", pa.string()),
    ]
    fields += [(name, _arrow_type(ddl)) for name, ddl in columns.items()]
    return pa.schema(fields)


def typed_spool_ddl(key_col: str, key_type: str, columns: dict[str, str]) -> str:
    """The matching Spark stream-schema DDL for a typed spool (what a
    `pg2ch_spool` readStream declares)."""
    cols = ", ".join(f"{n} {t}" for n, t in columns.items())
    return f"table string, {key_col} {key_type}, ver bigint, op string, {cols}"


def typed_rows(
    key_col: str, columns: dict[str, str]
) -> Callable[[CdcRow], list[dict]]:
    """Mapper factory for TYPED tables: CdcRow → normalized rows whose
    value columns keep their decoded Python types (Decimal, date,
    datetime, list, …) so the spool's parquet schema is the table's
    real schema.

    Semantics mirror `default_rows` on the full DML surface — key
    change splits into tombstone + new row, TRUNCATE is a relation
    marker — generalized to N value columns: a TOAST-UNCHANGED column
    resolves from the REPLICA IDENTITY FULL old tuple per column (the
    only place the unsent value exists on the wire); without RI FULL
    the event is unresolvable and fails LOUDLY, never lands NULL over
    real data. ``key_col`` names the replicated table's key column as
    it appears in the wire Relation (and becomes the spool's key
    column); ``columns`` maps each replicated VALUE column to its
    Spark type (the pg2ch YAML column-map analog)."""

    def to_rows(r: CdcRow) -> list[dict]:
        def row(key, op, values: dict):
            d = {"table": r.relation, key_col: key, "ver": r.scalar_ver, "op": op}
            for c in columns:
                d[c] = values.get(c)
            return d

        if r.op == "T":
            return [row(None, "T", {})]
        if r.op == "D":
            old = (r.old_key or {}).get(key_col)
            if old is None:
                raise ValueError(
                    f"typed mapper: key column {key_col!r} not in the "
                    f"DELETE's replica-identity tuple for {r.relation!r} "
                    f"(wire columns: {sorted(r.old_key or {})}) — "
                    "check TableSpec.key_col against the source table"
                )
            return [row(old, "D", {})]
        key = r.values.get(key_col)
        if key is None:
            # a typo'd key_col would otherwise land NULL-key rows that
            # merge into one garbage key — fail at the first change
            raise ValueError(
                f"typed mapper: key column {key_col!r} absent or NULL in "
                f"{r.relation!r} (wire columns: {sorted(r.values)}) — "
                "check TableSpec.key_col against the source table"
            )
        vals = {}
        for c in columns:
            v = r.values.get(c)
            if v is UNCHANGED:
                if not r.old_full:
                    raise ValueError(
                        f"TOAST-unchanged column {c!r} on relation "
                        f"{r.relation!r} needs REPLICA IDENTITY FULL to "
                        "resolve (old tuple kind 'K' carries NULL "
                        "placeholders, not values)"
                    )
                v = (r.old_key or {}).get(c)
                if v is UNCHANGED:
                    raise ValueError(
                        f"old tuple for {r.relation!r}.{c} is itself "
                        "TOAST-unchanged — unresolvable"
                    )
            vals[c] = v
        out = []
        if r.op == "U" and r.old_key:
            old = r.old_key.get(key_col)
            if old is not None and old != key:
                out.append(row(old, "D", {}))  # tombstone the vacated key
        out.append(row(key, r.op, vals))
        return out

    return to_rows


def _default_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("table", pa.string()),
            ("key", pa.int64()),
            ("ver", pa.int64()),
            ("op", pa.string()),
            ("value", pa.float64()),
        ]
    )


def _validate_prefix(table: str) -> None:
    """The stream reader recognizes flat spool entries by name; a table
    prefix outside its accepted alphabet would make the producer's
    transactions INVISIBLE to the consumer (silent data loss), so the
    contract is enforced at write time, loudly."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9_]+", table):
        raise ValueError(
            f"spool table prefix {table!r} must be non-empty [A-Za-z0-9_] — "
            "the stream reader matches entries by this naming contract"
        )


def _write_entry(spool_dir: str, name: str, rows: list[dict], schema) -> str:
    """Atomically publish one parquet spool entry (temp + rename)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(spool_dir, name)
    tmp = os.path.join(spool_dir, f".{name}.tmp")
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema])
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), tmp
    )
    os.replace(tmp, path)  # atomic: readers never list a partial file
    return path


def spool_transactions_routed(
    stream: Iterable[tuple[int, list[CdcRow]]],
    spool_dir: str,
    specs,
) -> Iterator[tuple[int, list[str]]]:
    """Multi-table spool with PER-RELATION schemas: each configured
    TableSpec gets its own subdirectory ``<spool_dir>/<table>/`` of
    LSN-named files in that table's own shape — typed when the spec
    declares ``columns`` (the pg2ch per-table YAML column map), the
    generic (key, value) shape otherwise.

    This is the daemon's R4 route applied AT THE LANDING ZONE: the
    flat single-schema spool cannot carry heterogeneous typed tables
    in one parquet file. Consumers read their own subdir (the
    pipeline's routed-spool convention), so a typed table's stream
    schema always matches its files. Relations NOT configured are
    skipped — the publication should match the table list, exactly as
    pg2ch replicates only its configured tables.

    Delivery contract is unchanged from `spool_transactions`: one
    yield per committed transaction AFTER every one of its files is
    durable (flush-then-ack through the spool); a replay rewrites the
    SAME names with the SAME bytes, and each table's streaming offset
    log dedups independently."""

    mappers: dict[str, tuple[Callable[[CdcRow], list[dict]], object]] = {}
    for spec in specs:
        _validate_prefix(spec.main_table)
        if getattr(spec, "columns", None):
            if getattr(spec, "engine", "") == "CollapsingMergeTree":
                # typed collapsing: PRE-SIGNED rows off the wire (the
                # reference's design — see typed_rows_signed)
                mappers[spec.main_table] = (
                    typed_rows_signed(spec.key_col, spec.columns),
                    typed_signed_spool_schema(
                        spec.key_col, spec.key_type, spec.columns
                    ),
                )
            else:
                mappers[spec.main_table] = (
                    typed_rows(spec.key_col, spec.columns),
                    typed_spool_schema(spec.key_col, spec.key_type, spec.columns),
                )
        else:
            mappers[spec.main_table] = (default_rows, _default_schema())
        os.makedirs(os.path.join(spool_dir, spec.main_table), exist_ok=True)

    try:
        for commit_lsn, rows in stream:
            by_rel: dict[str, list[dict]] = {}
            for r in rows:
                m = mappers.get(r.relation)
                if m is None:
                    continue  # unconfigured relation (see docstring)
                by_rel.setdefault(r.relation, []).extend(m[0](r))
            paths = []
            for rel, out_rows in by_rel.items():
                paths.append(
                    _write_entry(
                        os.path.join(spool_dir, rel),
                        f"{rel}-{commit_lsn:016x}.parquet",
                        out_rows,
                        mappers[rel][1],
                    )
                )
            yield commit_lsn, paths
    finally:
        close = getattr(stream, "close", None)
        if close is not None:
            close()


def spool_transactions(
    stream: Iterable[tuple[int, list[CdcRow]]],
    spool_dir: str,
    *,
    to_rows: Callable[[CdcRow], list[dict]] = default_rows,
    table: str = "cdc",
    schema=None,
) -> Iterator[tuple[int, str]]:
    """Land each committed transaction as one parquet file; yield
    (commit_lsn, path) AFTER the file is durable. Driving this with
    ``replication_stream`` gives flush-then-ack through the spool:
    the inner generator acks an LSN only when this one is resumed,
    i.e. only after its file was atomically published."""
    os.makedirs(spool_dir, exist_ok=True)
    if schema is None:
        # the generic normalized shape (pipeline.CDC_SPOOL_SCHEMA);
        # typed tables pass typed_spool_schema(...) + typed_rows(...)
        schema = _default_schema()
    _validate_prefix(table)
    try:
        for commit_lsn, rows in stream:
            path = _write_entry(
                spool_dir,
                f"{table}-{commit_lsn:016x}.parquet",
                [d for r in rows for d in to_rows(r)],
                schema,
            )
            yield commit_lsn, path
    finally:
        # tear the protocol client down WITH the spool (a dying spool
        # is a dying consumer: close the socket now — deterministically,
        # not at GC — so the unacked tail replays on reconnect)
        close = getattr(stream, "close", None)
        if close is not None:
            close()


def typed_rows_signed(
    key_col: str, columns: dict[str, str]
) -> Callable[[CdcRow], list[dict]]:
    """Mapper factory for TYPED CollapsingMergeTree tables: CdcRow →
    PRE-SIGNED rows, the reference's own collapsing design — pg2ch
    derives the −1/+1 pair straight from the wire (REPLICA IDENTITY
    FULL ships the old tuple), and ClickHouse does the netting; no
    sink-side per-key carry state exists anywhere.

    - INSERT  → (+1, new values)
    - UPDATE  → (−1, OLD values at the old key) + (+1, new values) —
      key changes need no special case: the −1 row already lands on
      the old key
    - DELETE  → (−1, OLD values)
    - TRUNCATE → relation marker ('T', sign 0)

    Old values come ONLY from an RI FULL old tuple; without it the −1
    row cannot be built and the mapper fails LOUDLY (the same
    requirement pg2ch's collapsing engine documents). TOAST-unchanged
    columns in the NEW image resolve from the same old tuple."""

    def to_rows(r: CdcRow) -> list[dict]:
        def row(key, op, sign, values: dict):
            d = {
                "table": r.relation, key_col: key, "ver": r.scalar_ver,
                "op": op, "sign": sign,
            }
            for c in columns:
                d[c] = values.get(c)
            return d

        def need_full(what: str) -> dict:
            if not r.old_full:
                raise ValueError(
                    f"typed collapsing needs REPLICA IDENTITY FULL to "
                    f"build the -1 row for a {what} on {r.relation!r} "
                    "(old tuple kind 'K' carries NULL placeholders)"
                )
            return r.old_key or {}

        if r.op == "T":
            return [row(None, "T", 0, {})]
        if r.op == "D":
            old = need_full("DELETE")
            return [row(old.get(key_col), "D", -1, old)]
        new_vals = dict(r.values)
        if any(v is UNCHANGED for v in new_vals.values()):
            old = need_full("TOAST-unchanged UPDATE")
            for c, v in new_vals.items():
                if v is UNCHANGED:
                    new_vals[c] = old.get(c)
        if r.op == "I":
            return [row(new_vals.get(key_col), "I", 1, new_vals)]
        old = need_full("UPDATE")
        return [
            row(old.get(key_col), "U", -1, old),
            row(new_vals.get(key_col), "U", 1, new_vals),
        ]

    return to_rows


def typed_signed_spool_schema(key_col: str, key_type: str, columns: dict[str, str]):
    """Schema of a typed SIGNED spool: the typed envelope plus the
    collapsing sign column."""
    import pyarrow as pa

    base = typed_spool_schema(key_col, key_type, columns)
    return base.insert(4, pa.field("sign", pa.int32()))


def typed_signed_spool_ddl(key_col: str, key_type: str, columns: dict[str, str]) -> str:
    cols = ", ".join(f"{n} {t}" for n, t in columns.items())
    return (
        f"table string, {key_col} {key_type}, ver bigint, op string, "
        f"sign int, {cols}"
    )
