"""pgoutput decoder tests: synthetic binary frames built byte-by-byte
from the public protocol spec, parsed back and folded into CDC rows —
pure-Python first, then distributed through the mapInPandas path and a
ReplacingMergeSink-style final state.

The encoder lives HERE, not in the engine: production never encodes
pgoutput (PostgreSQL does); tests need it to fabricate WAL.
"""

from __future__ import annotations

import struct

import pytest

from pg2ch_spark.sources import pgoutput as pg
from pg2ch_spark.sources.pgoutput import UNCHANGED

# ---------------------------------------------------------------------------
# Synthetic frame encoder (inverse of the parser, test-only)


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _tuple(*vals) -> bytes:
    out = struct.pack(">h", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        elif v is UNCHANGED:
            out += b"u"
        elif isinstance(v, bytes):
            out += b"b" + struct.pack(">i", len(v)) + v
        else:
            s = str(v).encode()
            out += b"t" + struct.pack(">i", len(s)) + s
    return out


def begin(lsn: int, xid: int, ts_us: int = 0) -> bytes:
    return b"B" + struct.pack(">qqi", lsn, ts_us, xid)


def commit(lsn: int, ts_us: int = 0) -> bytes:
    return b"C" + struct.pack(">bqqq", 0, lsn, lsn + 8, ts_us)


def relation(oid: int, name: str, cols: list[tuple[int, str, int]], ns: str = "public") -> bytes:
    body = struct.pack(">I", oid) + _cstr(ns) + _cstr(name) + b"d"
    body += struct.pack(">h", len(cols))
    for flags, cname, toid in cols:
        body += struct.pack(">b", flags) + _cstr(cname) + struct.pack(">Ii", toid, -1)
    return b"R" + body


def insert(oid: int, *vals) -> bytes:
    return b"I" + struct.pack(">I", oid) + b"N" + _tuple(*vals)


def update(oid: int, new: tuple, old: tuple | None = None, old_kind: bytes = b"K") -> bytes:
    body = struct.pack(">I", oid)
    if old is not None:
        body += old_kind + _tuple(*old)
    return b"U" + body + b"N" + _tuple(*new)


def delete(oid: int, *key_vals, kind: bytes = b"K") -> bytes:
    return b"D" + struct.pack(">I", oid) + kind + _tuple(*key_vals)


def truncate(*oids, options: int = 0) -> bytes:
    return b"T" + struct.pack(">ib", len(oids), options) + b"".join(
        struct.pack(">I", o) for o in oids
    )


USERS_OID = 16384
USERS = relation(USERS_OID, "users", [(1, "id", 23), (0, "name", 25), (0, "score", 701)])


# ---------------------------------------------------------------------------
# Wire-level parsing


class TestParse:
    def test_begin_commit(self):
        b = pg.parse_message(begin(1000, 77, ts_us=5))
        assert (b.final_lsn, b.xid) == (1000, 77)
        assert b.commit_ts_us == 5 + 946_684_800_000_000
        c = pg.parse_message(commit(1000))
        assert (c.commit_lsn, c.end_lsn) == (1000, 1008)

    def test_relation_columns_and_key(self):
        r = pg.parse_message(USERS)
        assert (r.oid, r.namespace, r.name) == (USERS_OID, "public", "users")
        assert [c.name for c in r.columns] == ["id", "name", "score"]
        assert r.key_columns == ("id",)

    def test_insert_tuple_kinds(self):
        m = pg.parse_message(insert(USERS_OID, 1, None, 2.5))
        assert m.new == ("1", None, "2.5")

    def test_update_with_old_key(self):
        m = pg.parse_message(update(USERS_OID, new=(2, "bob", 1.0), old=(1, None, None)))
        assert m.old == ("1", None, None)
        assert m.new == ("2", "bob", "1.0")

    def test_update_without_old_key(self):
        m = pg.parse_message(update(USERS_OID, new=(2, "bob", 1.0)))
        assert m.old is None

    def test_delete_key_tuple(self):
        m = pg.parse_message(delete(USERS_OID, 9, None, None))
        assert m.old == ("9", None, None)

    def test_unchanged_toast_marker(self):
        m = pg.parse_message(insert(USERS_OID, 1, UNCHANGED, 0.0))
        assert m.new[1] is UNCHANGED

    def test_binary_column(self):
        m = pg.parse_message(insert(USERS_OID, 1, b"\x00\xffraw", 0.0))
        assert m.new[1] == b"\x00\xffraw"

    def test_truncate(self):
        m = pg.parse_message(truncate(USERS_OID, 99, options=3))
        assert m.rel_oids == (USERS_OID, 99)
        assert m.cascade and m.restart_identity

    def test_unknown_tag_raises(self):
        with pytest.raises(pg.PgOutputError):
            pg.parse_message(b"Zjunk")

    def test_value_decode_by_oid(self):
        assert pg.decode_value("42", 23) == 42
        assert pg.decode_value("2.5", 701) == 2.5
        assert pg.decode_value("t", 16) is True
        assert pg.decode_value("f", 16) is False
        assert pg.decode_value("abc", 25) == "abc"
        assert pg.decode_value(None, 23) is None


# ---------------------------------------------------------------------------
# WAL fold semantics


class TestDecodeStream:
    def _wal(self) -> list[bytes]:
        return [
            USERS,
            begin(100, 1),
            insert(USERS_OID, 1, "alice", 1.5),
            insert(USERS_OID, 2, "bob", 2.0),
            commit(100),
            begin(200, 2),
            update(USERS_OID, new=(2, "bobby", 3.5)),
            delete(USERS_OID, 1, None, None),
            commit(200),
        ]

    def test_rows_emitted_at_commit_with_lsn_versions(self):
        rows = list(pg.decode_stream(self._wal()))
        assert [(r.op, r.lsn, r.seq) for r in rows] == [
            ("I", 100, 0),
            ("I", 100, 1),
            ("U", 200, 0),
            ("D", 200, 1),
        ]
        assert rows[0].values == {"id": 1, "name": "alice", "score": 1.5}
        assert rows[2].values == {"id": 2, "name": "bobby", "score": 3.5}
        assert rows[3].old_key == {"id": 1, "name": None, "score": None}
        # scalar version preserves (lsn, seq) order
        vers = [r.scalar_ver for r in rows]
        assert vers == sorted(vers)

    def test_uncommitted_tx_emits_nothing(self):
        wal = [USERS, begin(300, 3), insert(USERS_OID, 5, "eve", 0.0)]  # no commit
        assert list(pg.decode_stream(wal)) == []

    def test_change_before_relation_raises(self):
        with pytest.raises(pg.PgOutputError, match="unknown relation"):
            list(pg.decode_stream([begin(1, 1), insert(USERS_OID, 1, "x", 0.0)]))

    def test_truncate_rows(self):
        wal = [USERS, begin(50, 9), truncate(USERS_OID), commit(50)]
        rows = list(pg.decode_stream(wal))
        assert [(r.op, r.relation) for r in rows] == [("T", "users")]


# ---------------------------------------------------------------------------
# Distributed decode + replacing-merge final state


def test_decode_frames_distributed_matches_pure_python(spark):
    # Two WAL segments (≙ two partitions), interleaved tables of one txn each
    seg0 = [
        begin(100, 1),
        insert(USERS_OID, 1, "alice", 1.5),
        insert(USERS_OID, 2, "bob", 2.0),
        commit(100),
    ]
    seg1 = [
        begin(200, 2),
        update(USERS_OID, new=(2, "bobby", 3.5)),
        insert(USERS_OID, 3, None, None),
        commit(200),
    ]
    frames = [(0, i, f) for i, f in enumerate(seg0)] + [(1, i, f) for i, f in enumerate(seg1)]
    frames_df = spark.createDataFrame(frames, "part int, idx int, frame binary")

    out = pg.decode_frames(frames_df, preamble=[USERS], value_columns=["id", "name", "score"])
    got = sorted(
        (r.op, r.lsn, r.seq, r.id, r.name, r.score) for r in out.collect()
    )
    want_rows = list(pg.decode_stream([USERS] + seg0 + seg1))
    want = sorted(
        (
            r.op,
            r.lsn,
            r.seq,
            str(r.values["id"]) if r.op != "D" else None,
            None if r.values.get("name") is None else str(r.values["name"]),
            None if r.values.get("score") is None else str(r.values["score"]),
        )
        for r in want_rows
    )
    assert got == want

    # Replacing-merge the decoded log by key -> final table state,
    # closing the loop to the CDC engines (R3 -> R5/R6).
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("ver").desc())
    final = (
        out.where(F.col("op") != "T")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col("op") != "D")
        .select("id", "name", "score")
    )
    state = {r.id: (r.name, r.score) for r in final.collect()}
    assert state == {"1": ("alice", "1.5"), "2": ("bobby", "3.5"), "3": (None, None)}


def test_decode_frames_preamble_rejects_committed_changes(spark):
    frames_df = spark.createDataFrame(
        [(0, 0, begin(10, 1)), (0, 1, insert(USERS_OID, 1, "x", 0.0)), (0, 2, commit(10))],
        "part int, idx int, frame binary",
    )
    bad_preamble = [USERS, begin(5, 7), insert(USERS_OID, 9, "pre", 0.0), commit(5)]
    out = pg.decode_frames(frames_df, preamble=bad_preamble, value_columns=["id"])
    with pytest.raises(Exception, match="preamble"):
        out.collect()


# ---------------------------------------------------------------------------
# Property tests: random tuples round-trip through encode→parse, and a
# mid-stream Relation message re-types the table (PostgreSQL sends a new
# Relation before the first change that uses a new schema).

from hypothesis import given, settings, strategies as st

_val = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    ),
    st.binary(max_size=40),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_val, min_size=1, max_size=8))
def test_tuple_roundtrip(vals):
    cols = [(0, f"c{i}", 25) for i in range(len(vals))]
    rel = relation(999, "t", cols)
    msg = pg.parse_message(insert(999, *vals))
    parsed = msg.new
    for raw, v in zip(parsed, vals):
        if v is None:
            assert raw is None
        elif isinstance(v, bytes):
            assert raw == v
        else:
            assert raw == str(v)
    # and the full fold decodes against the relation
    rows = list(pg.decode_stream([rel, begin(7, 1), insert(999, *vals), commit(7)]))
    assert len(rows) == 1 and len(rows[0].values) == len(vals)


def test_relation_replacement_mid_stream_is_refused():
    """A second Relation frame with a DIFFERENT column set is source
    DDL: round 7 (VERDICT r6 item 6) made this a HARD STOP instead of
    silently adopting the new shape — downstream spool schemas,
    TableSpec column maps and CH tables are typed for the old one, so
    continuing would land rows that no longer fit the declared
    contract. Full drift matrix in TestSchemaDrift below."""
    rel_v1 = relation(777, "t", [(1, "id", 23)])
    rel_v2 = relation(777, "t", [(1, "id", 23), (0, "note", 25)])
    wal = [
        rel_v1,
        begin(10, 1),
        insert(777, 5),
        commit(10),
        rel_v2,  # schema change: column added
        begin(20, 2),
        insert(777, 6, "hello"),
        commit(20),
    ]
    with pytest.raises(pg.SchemaDriftError, match="manual resync"):
        list(pg.decode_stream(wal))


def test_tuple_arity_mismatch_raises():
    rel = relation(555, "t", [(1, "id", 23), (0, "x", 25)])
    with pytest.raises(pg.PgOutputError, match="columns"):
        list(pg.decode_stream([rel, begin(1, 1), insert(555, 1), commit(1)]))


def test_wal_to_buffered_merge_sink_end_to_end(spark, tmp_path):
    """Full reference pipeline in one test: pgoutput frames (R2) →
    distributed decode (R3) → replacing-merge through the two-tier
    BufferedMergeSink (R6+R8/R9), with a replayed segment proving the
    at-least-once convergence argument end-to-end."""
    import pyspark.sql.functions as F

    from pg2ch_spark.cdc.merge_sink import BufferedMergeSink

    segs = [
        [begin(100, 1), insert(USERS_OID, 1, "a", 1.0), insert(USERS_OID, 2, "b", 2.0), commit(100)],
        [begin(200, 2), update(USERS_OID, new=(1, "a2", 1.5)), commit(200)],
        [begin(300, 3), delete(USERS_OID, 2, None, None), commit(300)],
    ]
    frames = [
        (si, i, f) for si, seg in enumerate(segs) for i, f in enumerate(seg)
    ]
    frames_df = spark.createDataFrame(frames, "part int, idx int, frame binary")
    decoded = pg.decode_frames(
        frames_df, preamble=[USERS], value_columns=["id", "name", "score"]
    ).localCheckpoint(eager=True)

    sink = BufferedMergeSink(
        spark, str(tmp_path / "state"), key_col="id", ver_col="ver", merge_every=2
    )
    for si in range(len(segs)):
        batch = decoded.where(F.col("lsn") == 100 * (si + 1))
        sink.merge(batch)
    sink.merge(decoded.where(F.col("lsn") == 200))  # replayed delivery

    final = sink.state().where(F.col("op") != "D").select("id", "name").collect()
    assert {(r.id, r.name) for r in final} == {("1", "a2")}


# ---------------------------------------------------------------------------
# Round-2 review fixes: chunk-spanning transactions, TOAST markers,
# NUMERIC precision, binary-transfer rendering


def test_numeric_oid_decodes_exact_decimal():
    # float() would lose precision past ~16 significant digits; round 7
    # upgraded NUMERIC from keep-as-text to exact Decimal (typed column
    # mapping), which _emit_value stringifies back losslessly
    from decimal import Decimal

    big = "12345678901234567890.12"
    assert pg.decode_value(big, 1700) == Decimal(big)
    assert pg._emit_value(pg.decode_value(big, 1700)) == big
    assert pg.decode_value("2.5", 701) == 2.5  # float8 still a float


def test_emit_value_bytes_and_unchanged():
    assert pg._emit_value(b"\x01\xab") == "\\x01ab"
    assert pg._emit_value(pg.UNCHANGED) == pg.UNCHANGED_MARKER
    assert pg._emit_value(None) is None
    assert pg._emit_value("x") == "x"


def test_decode_frames_tx_spans_arrow_chunks(spark):
    """A transaction straddling an Arrow chunk boundary must decode
    whole: per-chunk decoders would raise 'outside a transaction' or
    silently drop the trailing uncommitted frames."""
    n = 25
    seg = [begin(100, 1)]
    seg += [insert(USERS_OID, i, f"u{i}", float(i)) for i in range(n)]
    seg += [commit(100)]
    frames_df = spark.createDataFrame(
        [(0, i, f) for i, f in enumerate(seg)], "part int, idx int, frame binary"
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "7")  # force many chunks per partition
    try:
        out = pg.decode_frames(frames_df, preamble=[USERS], value_columns=["id"])
        got = sorted(int(r.id) for r in out.collect())
    finally:
        spark.conf.set(key, old) if old is not None else spark.conf.unset(key)
    assert got == list(range(n))


def test_unchanged_toast_marker_and_resolution(spark):
    """'u' TOAST columns must NOT collapse to NULL (a replacing merge
    would overwrite the real value); they emit UNCHANGED_MARKER and
    resolve_unchanged() restores the prior version's value — while
    genuine SQL NULLs are preserved, not skipped over."""
    seg = [
        begin(100, 1),
        insert(USERS_OID, 1, "alice", 1.5),
        commit(100),
        begin(200, 2),
        update(USERS_OID, new=(1, UNCHANGED, 9.0)),  # TOAST not re-sent
        commit(200),
        begin(300, 3),
        update(USERS_OID, new=(1, None, 9.5)),  # genuine NULL overwrite
        commit(300),
        begin(400, 4),
        update(USERS_OID, new=(1, UNCHANGED, 9.9)),  # unchanged after NULL
        commit(400),
    ]
    frames_df = spark.createDataFrame(
        [(0, i, f) for i, f in enumerate(seg)], "part int, idx int, frame binary"
    )
    out = pg.decode_frames(frames_df, preamble=[USERS], value_columns=["id", "name", "score"])
    by_lsn = {r.lsn: r for r in out.collect()}
    assert by_lsn[200].name == pg.UNCHANGED_MARKER  # marker, not NULL
    assert by_lsn[300].name is None

    resolved = pg.resolve_unchanged(out, key_col="id", ver_col="ver", value_columns=["name"])
    names = {r.lsn: r.name for r in resolved.collect()}
    assert names[100] == "alice"
    assert names[200] == "alice"  # marker -> prior real value
    assert names[300] is None  # genuine NULL kept
    assert names[400] is None  # marker -> prior version's NULL, not "alice"


class TestSchemaDrift:
    """A changed Relation mid-stream is DDL on the source — the decoder
    must fail with the named error, never silently misdecode (VERDICT
    r6 item 6)."""

    def _decoder_with(self, cols):
        import pg2ch_spark.sources.pgoutput as pg

        dec = pg.WalDecoder()
        list(dec.push(relation(42, "t", cols)))
        return dec

    def test_identical_reannouncement_is_normal(self):
        cols = [(1, "id", 23), (0, "v", 701)]
        dec = self._decoder_with(cols)
        list(dec.push(relation(42, "t", cols)))  # session restart shape
        list(dec.push(begin((1 << 32) | 1, xid=5)))
        list(dec.push(insert(42, 7, 1.5)))
        rows = list(dec.push(commit((1 << 32) | 1)))
        assert [(r.op, r.values["id"]) for r in rows] == [("I", 7)]

    def test_added_column_is_loud(self):
        from pg2ch_spark.sources.pgoutput import SchemaDriftError

        dec = self._decoder_with([(1, "id", 23), (0, "v", 701)])
        with pytest.raises(SchemaDriftError, match="changed shape mid-stream"):
            list(dec.push(relation(42, "t", [(1, "id", 23), (0, "v", 701),
                                             (0, "extra", 25)])))

    def test_retyped_column_is_loud(self):
        from pg2ch_spark.sources.pgoutput import SchemaDriftError

        dec = self._decoder_with([(1, "id", 23), (0, "v", 701)])
        with pytest.raises(SchemaDriftError, match="manual resync"):
            # v: float8 -> numeric (ALTER COLUMN TYPE)
            list(dec.push(relation(42, "t", [(1, "id", 23), (0, "v", 1700)])))

    def test_renamed_column_is_loud(self):
        from pg2ch_spark.sources.pgoutput import SchemaDriftError

        dec = self._decoder_with([(1, "id", 23), (0, "v", 701)])
        with pytest.raises(SchemaDriftError):
            list(dec.push(relation(42, "t", [(1, "id", 23), (0, "w", 701)])))
