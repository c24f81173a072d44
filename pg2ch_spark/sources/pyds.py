"""ClickHouse TabSeparated re-source as a Spark PYTHON DATA SOURCE —
the public `pyspark.sql.datasource` extension API (Spark 4).

Why this exists: the engine's R12 sink speaks ClickHouse's
TabSeparated dialect (sources/clickhouse.py `escape_value`: ``\\t``
``\\n`` ``\\r`` ``\\\\`` escapes, ``\\N`` nulls). Spark's built-in CSV
reader cannot read that dialect back — CSV has no character-escape
concept (only quoting), so a payload containing a real tab or newline
roundtrips through `sep="\\t"` CSV as corruption. This module is the
exact inverse of the sink encoder, packaged the way a PRODUCTION
custom source should be on Spark 4: a `DataSource` plugin whose
reader fans out one `InputPartition` per file — the same parallelism
contract as the native file sources, with the dialect logic in plain
Python (Arrow-batched by the framework).

It is also the repo's demonstration of the extension point a live
walsender source would productionize through: `partitions()` answers
"how does this parallelize" (files/slots/ranges), `read(partition)`
is a per-task generator, and the DECLARED schema drives typed
conversion — no inference pass over 100 TB of text.

Registered per session via ``register(spark)`` (idempotent).
"""

from __future__ import annotations

import os
from datetime import date, datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "clickhouse_tsv"

_UNESCAPE = {"t": "\t", "n": "\n", "r": "\r", "\\": "\\", "N": "N"}


def unescape_field(s: str) -> str | None:
    """One TabSeparated literal → its value (inverse of
    `clickhouse.escape_value` for string payloads; ``\\N`` → None)."""
    if s == "\\N":
        return None
    if "\\" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            out.append(_UNESCAPE.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _converter(type_name: str):
    """Declared Spark type → Python converter for an unescaped field."""
    if type_name in ("bigint", "int", "smallint", "tinyint", "long", "integer"):
        return int
    if type_name in ("double", "float"):
        return float
    if type_name == "boolean":
        return lambda s: s == "1"
    if type_name == "date":
        return lambda s: date.fromisoformat(s)
    if type_name.startswith("timestamp"):
        # the sink encodes DateTime64 with 6 (µs) or 9 (ns) fractional
        # digits; strptime's %f stops at 6, so parse the fraction by
        # hand — Spark's timestamp is µs anyway, so ns truncate to the
        # column type's own precision
        def _ts(s: str) -> datetime:
            base, _, frac = s.partition(".")
            dt = datetime.strptime(base, "%Y-%m-%d %H:%M:%S")
            if frac:
                dt = dt.replace(microsecond=int(frac[:6].ljust(6, "0")))
            return dt

        return _ts
    if type_name == "string":
        return lambda s: s
    raise ValueError(f"clickhouse_tsv: unsupported declared type {type_name!r}")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _arrow_type(type_name: str):
    """Declared Spark type → pyarrow type for the batched read path."""
    import pyarrow as pa

    mapping = {
        "tinyint": pa.int8(), "smallint": pa.int16(),
        "int": pa.int32(), "integer": pa.int32(),
        "bigint": pa.int64(), "long": pa.int64(),
        "float": pa.float32(), "double": pa.float64(),
        "boolean": pa.bool_(), "string": pa.string(),
        "date": pa.date32(),
    }
    if type_name in mapping:
        return mapping[type_name]
    if type_name.startswith("timestamp"):
        return pa.timestamp("us")
    raise ValueError(f"clickhouse_tsv: unsupported declared type {type_name!r}")


_TSV_BATCH_ROWS = 8192  # rows per Arrow batch out of the line parser


class _TsvReader(DataSourceReader):
    def __init__(self, schema, options):
        path = options.get("path")
        if not path:
            raise ValueError("clickhouse_tsv requires option 'path'")
        if os.path.isdir(path):
            self._files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith((".", "_")) and not f.endswith(".crc")
            )
        else:
            self._files = [path]
        self._convs = [_converter(f.dataType.simpleString()) for f in schema.fields]
        self._names = [f.name for f in schema.fields]
        self._types = [f.dataType.simpleString() for f in schema.fields]

    def partitions(self):
        # one partition per part file — the distributed sink wrote many
        # parts, the re-read fans out the same way (native-source shape)
        return [_FilePartition(p) for p in self._files]

    def _col_array(self, vals: list, i: int, atype):
        """One buffered column of raw unescaped strings → a typed Arrow
        array, converted COLUMN-WISE by Arrow's native string casts
        (r9, VERDICT r8 item 5) instead of one Python ``convs[i](u)``
        call per cell. Semantics per type vs the old per-value path:
        int/float/date/bool parse the identical literal grammar the
        sink emits (floats incl. nan/inf, bools are '1'/'0'); 0- and
        6-digit-fraction timestamps cast exactly; ONLY a 9-digit (ns)
        fraction makes Arrow's us-cast raise, and that column batch
        falls back to the old per-value parser so ns truncation
        semantics stay bit-identical (Arrow's ns->us safe=False cast
        truncates toward zero, which differs by 1µs pre-epoch)."""
        import pyarrow as pa

        type_name = self._types[i]
        if type_name == "string":
            return pa.array(vals, type=atype)
        s = pa.array(vals, type=pa.string())
        try:
            return s.cast(atype)
        except pa.ArrowInvalid:
            if type_name.startswith("timestamp"):
                conv = self._convs[i]
                return pa.array(
                    [None if v is None else conv(v) for v in vals], type=atype
                )
            raise

    def read(self, partition):
        """Parse the dialect line by line (escapes force that), but hand
        rows to the engine as Arrow RecordBatches: the Python→JVM hop is
        columnar instead of one pickled tuple per row (same parse, far
        cheaper transfer).

        Fast path (r9): a line with no backslash has no escapes and no
        nulls (``\\N`` contains one), so its fields ARE the values —
        buffered raw, no per-field ``unescape_field`` call; typed
        conversion then happens per COLUMN via Arrow casts
        (``_col_array``) instead of per cell in Python. Escaped lines
        (the rare case on real payloads) unescape per field into the
        same raw-string buffers, so both paths share one columnar
        conversion."""
        import pyarrow as pa

        ncols = len(self._convs)
        pa_schema = pa.schema(
            [(n, _arrow_type(t)) for n, t in zip(self._names, self._types)]
        )

        def flush(cols):
            return pa.RecordBatch.from_arrays(
                [
                    self._col_array(c, i, pa_schema.field(i).type)
                    for i, c in enumerate(cols)
                ],
                schema=pa_schema,
            )

        cols: list[list] = [[] for _ in range(ncols)]
        n_buf = 0
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                # raw tabs/newlines never occur inside a field (the
                # dialect escapes them), so str.split IS the parser
                fields = line.rstrip("\n").split("\t")
                if len(fields) != ncols:
                    raise ValueError(
                        f"{partition.path}: row has {len(fields)} fields, "
                        f"schema declares {ncols}"
                    )
                if "\\" in line:
                    for c, f in zip(cols, fields):
                        c.append(unescape_field(f))
                else:
                    for c, f in zip(cols, fields):
                        c.append(f)
                n_buf += 1
                if n_buf >= _TSV_BATCH_ROWS:
                    yield flush(cols)
                    cols = [[] for _ in range(ncols)]
                    n_buf = 0
        if n_buf:
            yield flush(cols)


class TabSeparatedDataSource(DataSource):
    """spark.read.format("clickhouse_tsv").schema(ddl).option("path", dir)"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        raise ValueError(
            "clickhouse_tsv has no inference pass — declare the schema "
            "(.schema(ddl)); guessing types would cost a full text scan"
        )

    def reader(self, schema) -> DataSourceReader:
        return _TsvReader(schema, self.options)


# ---------------------------------------------------------------------------
# WAL-spool STREAMING source — the custom streaming source a walsender
# deployment reads its landing zone with, on the same public plugin
# API (`DataSource.streamReader`). Offsets are the spool's OWN commit
# LSNs, not an opaque file list: `latestOffset` reports the highest
# transaction visible, `partitions(start, end)` hands each micro-batch
# exactly the transactions in (start, end], and a replayed transaction
# (at-least-once delivery rewrites the SAME LSN name with the SAME
# bytes) lands at-or-below the committed offset and is never re-read —
# the offset log turns the spool's at-least-once into exactly-once by
# construction, with a bounded (single-integer) offset instead of an
# ever-growing processed-file list.
#
# Two layouts, one contract "one LSN = one transaction":
#   - flat files  cdc-<lsn:016x>.parquet   (sources/spool.py's writer)
#   - hive dirs   lsn=<int>/part-*.parquet (a distributed partitionBy
#     write, for spools produced by Spark jobs rather than the
#     protocol client)


_FLAT_RE = None  # compiled lazily (module import stays cheap)


def _spool_entries(path: str) -> list[tuple[int, str]]:
    """(lsn, entry-path) for every COMMITTED transaction in the spool.

    Flat files (``<table>-<lsn:016x>.parquet``, any table prefix —
    `spool_transactions` parameterizes it) are committed by definition:
    the producer publishes them with an atomic rename. Hive-layout
    ``lsn=<n>`` directories come from a distributed partitionBy job
    whose dirs/part-files appear non-atomically per task — so they are
    recognized ONLY once the job's root ``_SUCCESS`` marker exists
    (mode("overwrite") recreates the directory, so no marker exists
    until the job commits). A spool with lsn= dirs but no marker is an
    ERROR, not silence: treating an in-flight write as committed would
    let latestOffset advance past a late-landing transaction and lose
    it forever. Live incremental producers must use the flat layout.
    """
    global _FLAT_RE
    if _FLAT_RE is None:
        import re

        _FLAT_RE = re.compile(r"^[A-Za-z0-9_]+-([0-9a-fA-F]{16})\.parquet$")
    out: list[tuple[int, str]] = []
    hive: list[tuple[int, str]] = []
    for name in os.listdir(path):
        p = os.path.join(path, name)
        m = _FLAT_RE.match(name)
        if m:
            out.append((int(m.group(1), 16), p))
        elif name.startswith("lsn=") and os.path.isdir(p):
            hive.append((int(name[4:]), p))
    if hive:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise ValueError(
                f"pg2ch_spool: {path} has lsn= directories but no _SUCCESS "
                "marker — the partitionBy producer has not committed; a "
                "concurrently-appended spool must use the flat atomic "
                "layout (sources.spool.spool_transactions)"
            )
        out.extend(hive)
    out.sort()
    return out


class _SpoolPartition(InputPartition):
    def __init__(self, entry: str):
        self.entry = entry


class SpoolStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("pg2ch_spool requires option 'path'")
        self._fields = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"lsn": -1}

    def latestOffset(self):
        entries = _spool_entries(self._path)
        return {"lsn": entries[-1][0] if entries else -1}

    def partitions(self, start, end):
        new = [
            _SpoolPartition(p)
            for lsn, p in _spool_entries(self._path)
            if start["lsn"] < lsn <= end["lsn"]
        ]
        # the engine requires >= 1 partition per planned batch
        return new or [_SpoolPartition("")]

    def read(self, partition):
        import pyarrow.parquet as pq

        if not partition.entry:
            return
        if os.path.isdir(partition.entry):
            files = sorted(
                os.path.join(partition.entry, f)
                for f in os.listdir(partition.entry)
                if f.endswith(".parquet")
            )
        else:
            files = [partition.entry]
        for f in files:
            table = pq.read_table(f, columns=self._fields)
            # Yield Arrow RecordBatches directly (the plugin API accepts
            # them since Spark 4): the batch crosses the Python→JVM
            # boundary columnar, instead of to_pylist()+zip row tuples
            # pickled one by one — same rows, no per-row Python loop.
            yield from table.to_batches()

    def commit(self, end):
        # nothing to do: progress durability lives in the engine's
        # offset log; spool retention is the producer's concern (it
        # acks its upstream only after the file is durable)
        pass


class SpoolDataSource(DataSource):
    """spark.readStream.format("pg2ch_spool").schema(ddl).option("path", dir)"""

    @classmethod
    def name(cls) -> str:
        return "pg2ch_spool"

    def schema(self):
        raise ValueError(
            "pg2ch_spool has no inference pass — declare the schema "
            "(the spool's normalized CDC shape: pipeline.CDC_SPOOL_SCHEMA)"
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SpoolStreamReader(schema, self.options)


def register(spark) -> None:
    """Register both formats with this session (idempotent — re-register
    simply replaces the prior entry)."""
    spark.dataSource.register(TabSeparatedDataSource)
    spark.dataSource.register(SpoolDataSource)
