"""Pinned streaming semantics (SURVEY §7 hazards H4/H5).

H5: session_window gap boundary — measured behavior (Spark 4.1): events
at exactly `gap` distance MERGE into one session; a new session starts
only when the inter-event gap is strictly greater than the gap. The
group-J islands oracle therefore uses `diff > 1800`.

H4: availableNow replay determinism — same input, two runs, identical
results.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F


def _session_counts(spark, rows):
    df = spark.createDataFrame(rows, "user_id int, t long").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    d = tempfile.mkdtemp(prefix="pg2ch_sesssem_")
    df.write.mode("overwrite").parquet(d)
    sdf = spark.readStream.schema(df.schema).parquet(d)
    q = (
        sdf.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .writeStream.format("memory")
        .queryName("sess_sem")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT user_id, count(*) AS n_sessions FROM "
        "(SELECT user_id, session_window FROM sess_sem) GROUP BY user_id"
    ).collect()


def test_session_gap_boundary_merges_at_exact_gap(spark):
    rows = [
        (1, 0), (1, 1800),          # gap == 1800 → ONE session (merges)
        (2, 0), (2, 1801),          # gap > 1800 → TWO sessions
        (3, 0), (3, 1799),          # gap < 1800 → ONE session
    ]
    got = {r.user_id: r.n_sessions for r in _session_counts(spark, rows)}
    assert got == {1: 1, 2: 2, 3: 1}


def test_available_now_replay_deterministic(spark):
    from pg2ch_spark.registry import queries
    from tests.conftest import SF_T2

    q = queries()["stream_tumbling"]
    a = sorted(map(str, q(spark, SF_T2).collect()))
    b = sorted(map(str, q(spark, SF_T2).collect()))
    assert a == b


def test_multibatch_replay_through_buffered_sink(spark, tmp_path):
    """Three source files + maxFilesPerTrigger=1 → three real micro-
    batches. The memory-sink harness refuses this shape (stale-update
    guard); the production path — foreachBatch into the two-tier
    BufferedMergeSink — must converge to the batch answer across
    batches."""
    from pg2ch_spark.cdc.merge_sink import BufferedMergeSink

    src = tmp_path / "src"
    for i in range(3):
        spark.createDataFrame(
            [(k, i * 100 + k, float(i)) for k in range(20)],
            "key long, ver long, value double",
        ).coalesce(1).write.mode("append").parquet(str(src))

    schema = spark.read.parquet(str(src)).schema
    sink = BufferedMergeSink(
        spark, str(tmp_path / "state"), key_col="key", ver_col="ver", merge_every=2
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(sink.merge)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if int(p["numInputRows"]) > 0)
    assert n_batches == 3, "source must split into three micro-batches"

    final = {r.key: r.ver for r in sink.state().collect()}
    # argmax(ver) per key across all three files
    assert final == {k: 200 + k for k in range(20)}


def test_clickhouse_sink_from_writestream(spark, tmp_path):
    """R12 through a real writeStream: per-partition POSTs fire from
    inside foreachBatch and every input row reaches the endpoint."""
    import threading
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from pg2ch_spark.sources.clickhouse import clickhouse_sink

    received: list[bytes] = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            received.append(self.rfile.read(int(self.headers.get("Content-Length", 0))))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        src = tmp_path / "src"
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(50)], "k long, v string"
        ).write.parquet(str(src))
        schema = spark.read.parquet(str(src)).schema
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.foreachBatch(
                clickhouse_sink(f"http://127.0.0.1:{server.server_port}", "t", ["k", "v"])
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        server.shutdown()

    lines = sorted(
        line for body in received for line in body.decode().splitlines()
    )
    assert lines == sorted(f"{i}\tv{i}" for i in range(50))


def test_stream_stream_join_matches_across_micro_batches(spark, tmp_path):
    """Signups arrive in micro-batch 1, purchases in micro-batch 2
    (maxFilesPerTrigger=1 over two single-type files): every match must
    be produced from BUFFERED join state, not within-batch luck. Users
    1-5 purchase inside the 1h window (match); 6-10 purchase at +2h
    (no match — and their signups are evictable once the watermark
    passes)."""
    import shutil

    import pyspark.sql.functions as F

    from pg2ch_spark.streaming.runner import _few_state_partitions, scratch_dir

    src = tmp_path / "src"
    t0 = 1_700_000_000
    ns = 10**9
    spark.createDataFrame(
        [(i, "signup", t0 * ns) for i in range(1, 11)],
        "user_id long, event_type string, ts long",
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(i, "purchase", (t0 + 600) * ns) for i in range(1, 6)]
        + [(i, "purchase", (t0 + 7200) * ns) for i in range(6, 11)],
        "user_id long, event_type string, ts long",
    ).coalesce(1).write.mode("append").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    def side(event_type, alias):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .where(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user"),
                F.timestamp_seconds(F.expr("ts div 1000000000")).alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "1 hour")
        )

    joined = side("signup", "s").join(
        side("purchase", "p"),
        F.expr("s_user = p_user AND p_ts > s_ts AND p_ts <= s_ts + interval 1 hour"),
    ).select(F.col("s_user").alias("user_id"))

    out = scratch_dir("pg2ch_ssj_mb_out_")
    shutil.rmtree(out, ignore_errors=True)
    with _few_state_partitions(spark):
        q = (
            joined.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if int(p["numInputRows"]) > 0)
    assert n_batches >= 2, "each side's file must arrive in its own micro-batch"
    got = sorted(r.user_id for r in spark.read.parquet(out).collect())
    shutil.rmtree(out, ignore_errors=True)
    assert got == [1, 2, 3, 4, 5], got


def test_streaming_queries_reclaim_scratch(spark):
    """Every streaming query must remove its scratch dirs (checkpoint,
    staging, source symlinks, sink state) after returning — on the
    default /dev/shm base, leaks accumulate RAM across a bench loop."""
    import glob
    import os

    from pg2ch_spark import registry

    base = os.environ.get("SPARK_GRAFT_SCRATCH") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    )
    registry.load_all()
    qs = registry.queries()
    before = set(glob.glob(os.path.join(base, "pg2ch_*")))
    # stream_session/stream_custom_state use the parquet RESULT sink:
    # its dirs legitimately outlive the call, but must live on REAL
    # DISK (not the tmpfs base) and be registered for exit reclaim.
    from pg2ch_spark.streaming import runner

    # _RESULT_DIRS maps query key -> CURRENT dir (a re-run replaces
    # its predecessor), so "new" means the VALUE changed for a key —
    # an earlier suite test may already have registered these keys
    results_before = dict(runner._RESULT_DIRS)
    for key in ("stream_foreachbatch_upsert", "stream_stream_join",
                "stream_session", "stream_custom_state"):
        qs[key](spark, "/root/testdata/sf0.001").collect()
    leaked = set(glob.glob(os.path.join(base, "pg2ch_*"))) - before
    assert not leaked, f"tmpfs scratch dirs leaked: {sorted(leaked)}"
    new_results = [
        d for k, d in runner._RESULT_DIRS.items() if results_before.get(k) != d
    ]
    assert new_results, "parquet-sink queries must register their result dirs"
    for d in new_results:
        assert not d.startswith("/dev/shm"), f"result dir on tmpfs: {d}"
    # exit-time reclaim removes every registered dir
    runner._reclaim_result_dirs()
    assert not runner._RESULT_DIRS
    for d in new_results:
        assert not os.path.exists(d)


def test_parquet_sink_empty_source_returns_typed_empty(spark, tmp_path):
    """parquet_sink + a source whose only micro-batches carry no data:
    foreachBatch never writes, and the result must be an EMPTY frame
    with the transform's schema — not a schema-inference crash over an
    empty dir (the memory-sink path already behaved this way)."""
    import os

    from pg2ch_spark.streaming.runner import run_complete_to_df

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)  # a valid, empty stream source directory
    out = run_complete_to_df(
        spark,
        src_dir,
        "user_id bigint, value double",
        lambda df: df.groupBy("user_id").agg(F.sum("value").alias("total")),
        parquet_sink=True,
    )
    assert out.columns == ["user_id", "total"]
    assert out.count() == 0


def test_stream_dedup_collapses_true_replays(spark, tmp_path):
    """The sf fixtures carry UNIQUE event ids, so stream_dedup's actual
    dedup path never fires in the differential suite. This corpus
    replays events the way an at-least-once WAL delivery would —
    duplicate event_ids seconds-to-hours apart (all inside the 30-day
    horizon) — and the output must equal the batch DISTINCT, with one
    survivor per replayed id."""
    import os

    import duckdb
    import pandas as pd

    from pg2ch_spark import registry
    from tests.oracle import compare_frames

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []  # (event_id, offset_s, user_id, event_type)
    rows += [(1, 0, 10, "view"), (2, 5, 10, "purchase"), (3, 9, 11, "view")]
    # immediate redelivery (same payload, seconds later)
    rows += [(1, 12, 10, "view"), (2, 13, 10, "purchase")]
    # a late replay hours later, still in horizon
    rows += [(3, 7200, 11, "view")]
    # triple delivery of one event
    rows += [(4, 100, 12, "signup"), (4, 101, 12, "signup"), (4, 9000, 12, "signup")]
    pdf = pd.DataFrame(
        {
            "event_id": [e for e, _, _, _ in rows],
            "ts": [t0 + pd.Timedelta(seconds=o) for _, o, _, _ in rows],
            "user_id": [u for _, _, u, _ in rows],
            "event_type": [t for _, _, _, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    d = str(tmp_path / "replay")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"), coerce_timestamps=None)

    out = registry.queries()["stream_dedup"](spark, d).toPandas()
    assert len(out) == 4  # one survivor per distinct event_id

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    oracle = con.execute(registry.oracle_sql()["stream_dedup"]).df()
    r = compare_frames("stream_dedup-replay", out, oracle)
    assert r.ok, str(r)


def test_dedup_horizon_evicts_state_and_repasses_stale_replays(spark, tmp_path):
    """The other side of the 30-day dedup horizon: state EVICTS as the
    watermark advances, so a replay arriving beyond the horizon is a
    new event, not a duplicate. Two micro-batches (maxFilesPerTrigger=1):
    batch 1 carries the original; batch 2 advances the watermark ~60
    days and replays the id — past the horizon, so BOTH occurrences
    survive. This is the declared trade: bounded state (the 1000x
    probe OOMed the unbounded form) in exchange for exactly-once only
    within the replay horizon."""
    import os
    import shutil

    import pandas as pd

    from pg2ch_spark.streaming.runner import _few_state_partitions, scratch_dir

    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write_batch(dirname, fname, rows):
        pdf = pd.DataFrame(
            {
                "event_id": [e for e, _ in rows],
                "ts": [t0 + pd.Timedelta(seconds=o) for _, o in rows],
                "user_id": [1] * len(rows),
                "event_type": ["view"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )
        pdf.to_parquet(os.path.join(dirname, fname), coerce_timestamps=None)

    src = str(tmp_path / "src")
    os.makedirs(src)
    day = 86400
    # file mod-time order == batch order for the file stream source
    # (hence the sleeps). Eviction mechanics (verified empirically):
    # id 1's state expires at event_time + horizon = day 30; the
    # watermark the replay batch runs under derives from the PREVIOUS
    # batch's max event time, and eviction executes at the END of the
    # batch whose watermark first exceeds the expiry. So the stale
    # replay needs TWO advancer batches between it and the original:
    # b2 (day 61) raises the wm to day 31 for b3, b3's close evicts
    # id 1, and b4's replay at day 64 re-passes as a new event.
    import time as _time

    write_batch(src, "b1.parquet", [(1, 0), (2, 10)])
    _time.sleep(1.1)
    write_batch(src, "b2.parquet", [(4, 61 * day)])
    _time.sleep(1.1)
    write_batch(src, "b3.parquet", [(5, 63 * day)])
    _time.sleep(1.1)
    write_batch(src, "b4.parquet", [(1, 64 * day), (3, 64 * day + 5)])

    import pyspark.sql.functions as F

    from pg2ch_spark.streaming.queries import _events_schema, _with_event_time

    schema = spark.read.parquet(src).schema
    out = scratch_dir("pg2ch_horizon_out_")
    ckpt = scratch_dir("pg2ch_horizon_ckpt_")
    shutil.rmtree(out, ignore_errors=True)
    with _few_state_partitions(spark, rocksdb=True):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            _with_event_time(stream)
            .withWatermark("ets", "30 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id")
            .writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(
        int(r.event_id) for r in spark.read.parquet(out).collect()
    )
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    # id 1 appears TWICE: its day-64 replay arrives after the horizon
    # evicted its state, so it legitimately re-passes; the rest once
    assert got == [1, 1, 2, 3, 4, 5]


def test_result_dir_rerun_reclaims_predecessor(tmp_path, monkeypatch):
    """ADVICE r6: a long-lived process re-running the same query must
    hold at most ONE parquet-result copy per query key — distinct keys
    (concurrent suites) never reclaim each other."""
    import os

    from pg2ch_spark.streaming import runner

    monkeypatch.setattr(runner, "_RESULT_DIRS", {})
    a1 = runner.result_dir("t_", key="qA")
    b1 = runner.result_dir("t_", key="qB")
    a2 = runner.result_dir("t_", key="qA")  # re-run of qA
    assert not os.path.exists(a1), "predecessor for the same key leaked"
    assert os.path.exists(b1), "a different key was wrongly reclaimed"
    assert os.path.exists(a2)
    runner.release_result_dir(a2)
    assert not os.path.exists(a2)
    assert "qA" not in runner._RESULT_DIRS
    # untracked (key=None) dirs are still registered for exit reclaim
    c = runner.result_dir("t_")
    assert c in runner._RESULT_DIRS
    runner._reclaim_result_dirs()
    assert not os.path.exists(b1) and not os.path.exists(c)
