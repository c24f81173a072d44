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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        return lambda s: (
            datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f")
            if "." in s
            else datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
        )
    if type_name == "string":
        return lambda s: s
    raise ValueError(f"clickhouse_tsv: unsupported declared type {type_name!r}")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


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

    def partitions(self):
        # one partition per part file — the distributed sink wrote many
        # parts, the re-read fans out the same way (native-source shape)
        return [_FilePartition(p) for p in self._files]

    def read(self, partition):
        convs = self._convs
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                # raw tabs/newlines never occur inside a field (the
                # dialect escapes them), so str.split IS the parser
                fields = line.rstrip("\n").split("\t")
                if len(fields) != len(convs):
                    raise ValueError(
                        f"{partition.path}: row has {len(fields)} fields, "
                        f"schema declares {len(convs)}"
                    )
                yield tuple(
                    None if (u := unescape_field(f)) is None else conv(u)
                    for conv, f in zip(convs, fields)
                )


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


def register(spark) -> None:
    """Register the format with this session (idempotent — re-register
    simply replaces the prior entry)."""
    spark.dataSource.register(TabSeparatedDataSource)
