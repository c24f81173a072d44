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
