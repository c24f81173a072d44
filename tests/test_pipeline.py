"""End-to-end replication pipeline (R14 config + R15 lifecycle).

Drives `pg2ch_spark.pipeline.run_pipeline` the way a pg2ch user drives
the daemon: declare per-table specs (engine, key, version, merge
knobs), point it at a change source, and verify the resulting states
against independent DuckDB computations of the same engine semantics —
including a MULTI-batch replay (one file per micro-batch) that
exercises the collapsing sink's cross-batch prior-value carry, and a
re-run proving checkpointed idempotence.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from pg2ch_spark.pipeline import (
    TableSpec,
    run_pipeline,
    spec_from_mapping,
    teardown,
)
from tests.oracle import compare_frames

CDC_SQL = """
    SELECT user_id AS key, event_id AS ver,
           CASE event_type WHEN 'signup' THEN 'I'
                           WHEN 'error'  THEN 'D'
                           ELSE 'U' END AS op,
           value
    FROM read_parquet('{path}/events.parquet/*.parquet')
"""


@pytest.fixture(scope="module")
def pipe_sf_dir(tmp_path_factory):
    """A two-file events 'table': file 1 = first half of the log by
    version, file 2 = the rest — so maxFilesPerTrigger=1 yields two
    micro-batches whose per-key histories straddle the boundary."""
    t0 = pd.Timestamp("2024-03-01")
    rows = []
    # interleaved multi-key history: inserts, updates, deletes, re-adds
    script = [
        (1, "signup"), (2, "signup"), (1, "view"), (3, "view"),  # u3 starts with U
        (2, "purchase"), (1, "error"), (4, "signup"), (2, "view"),
        # --- file boundary ---
        (1, "signup"), (3, "error"), (4, "click"), (2, "error"),
        (5, "view"), (4, "purchase"), (5, "signup"), (1, "click"),
    ]
    for i, (u, et) in enumerate(script, start=1):
        rows.append((i, t0 + pd.Timedelta(seconds=10 * i), u, et, float(i), '{"k":1}'))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path_factory.mktemp("pipe_sf")
    table_dir = os.path.join(d, "events.parquet")
    os.makedirs(table_dir)
    df.iloc[:8].to_parquet(os.path.join(table_dir, "part-0.parquet"))
    df.iloc[8:].to_parquet(os.path.join(table_dir, "part-1.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def pipe_result(spark, pipe_sf_dir, tmp_path_factory):
    state_root = str(tmp_path_factory.mktemp("pipe_state"))
    specs = [
        TableSpec(main_table="t_replacing", engine="ReplacingMergeTree"),
        TableSpec(
            main_table="t_replacing_buffered",
            engine="ReplacingMergeTree",
            merge_threshold=2,
        ),
        TableSpec(main_table="t_collapsing", engine="CollapsingMergeTree"),
        TableSpec(main_table="t_append", engine="MergeTree"),
    ]
    res = run_pipeline(
        spark, specs, pipe_sf_dir, state_root, max_files_per_trigger=1
    )
    yield spark, pipe_sf_dir, state_root, specs, res
    teardown(state_root)


def _duck(pipe_sf_dir):
    return duckdb.connect(), CDC_SQL.format(path=pipe_sf_dir)


def test_multibatch_replay_ran_two_batches(pipe_result):
    *_, res = pipe_result
    assert res.batches["t_replacing"] >= 2  # one per file


def test_replacing_state_matches_oracle(pipe_result):
    spark, sf, *_ , res = pipe_result
    con, cdc = _duck(sf)
    expected = con.execute(
        f"WITH cdc AS ({cdc}) SELECT key, ver, op, value FROM cdc "
        "QUALIFY row_number() OVER (PARTITION BY key ORDER BY ver DESC) = 1"
    ).df()
    r = compare_frames(
        "replacing", res.states["t_replacing"].toPandas(), expected
    )
    assert r.ok, str(r)


def test_buffered_replacing_equals_single_tier(pipe_result):
    spark, *_ , res = pipe_result
    a = res.states["t_replacing"].toPandas().sort_values("key").reset_index(drop=True)
    b = (
        res.states["t_replacing_buffered"]
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_collapsing_signed_log_matches_lag_oracle(pipe_result):
    """The epoch-wise expansion with carried prior values must equal
    the global lag() expansion — per-key (net, rows, value balance)."""
    spark, sf, state_root, *_ , res = pipe_result
    con, cdc = _duck(sf)
    expected = con.execute(
        f"""
        WITH cdc AS ({cdc}),
        w AS (
            SELECT key, ver, op, value,
                   lag(value) OVER (PARTITION BY key ORDER BY ver) AS prev_value
            FROM cdc
        ), signed AS (
            SELECT key, ver, value, 1 AS sign FROM w WHERE op IN ('I', 'U')
            UNION ALL
            SELECT key, ver, prev_value AS value, -1 AS sign
            FROM w WHERE op IN ('U', 'D')
        )
        SELECT key, CAST(sum(sign) AS BIGINT) AS net_sign,
               count(*) AS n_rows,
               round(sum(sign * value), 2) AS val_balance
        FROM signed GROUP BY key
        """
    ).df()
    log = spark.read.parquet(os.path.join(state_root, "t_collapsing", "state"))
    import pyspark.sql.functions as F

    got = (
        log.groupBy("key")
        .agg(
            F.sum("sign").cast("bigint").alias("net_sign"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("sign") * F.col("value")), 2).alias("val_balance"),
        )
    ).toPandas()
    r = compare_frames("collapsing_log", got, expected)
    assert r.ok, str(r)


def test_append_log_is_the_full_change_stream(pipe_result):
    spark, sf, *_ , res = pipe_result
    con, cdc = _duck(sf)
    expected = con.execute(f"WITH cdc AS ({cdc}) SELECT * FROM cdc").df()
    got = (
        res.states["t_append"].select("key", "ver", "op", "value").toPandas()
    )
    r = compare_frames("append", got, expected)
    assert r.ok, str(r)


def test_rerun_is_idempotent(pipe_result):
    """Re-running against the same state_root resumes from the
    checkpoint: zero new batches, states unchanged."""
    spark, sf, state_root, specs, res = pipe_result
    before = res.states["t_replacing"].toPandas().sort_values("key")
    res2 = run_pipeline(spark, specs, sf, state_root, max_files_per_trigger=1)
    assert all(n == 0 for n in res2.batches.values()), res2.batches
    after = res2.states["t_replacing"].toPandas().sort_values("key")
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )


def test_spec_mapping_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown TableSpec keys"):
        spec_from_mapping({"main_table": "t", "mane_table": "typo"})
    with pytest.raises(ValueError, match="unknown engine"):
        TableSpec(main_table="t", engine="SummingMergeTree2")


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_collapsing_carry_equals_global_expansion(spark, tmp_path, seed):
    """Property: for a random op log split into random batches, the
    collapsing sink's accumulated signed log (with per-key prior-value
    carry across batches) equals the single-pass lag() expansion of
    the whole log — per-key net sign, row count, and value balance."""
    import numpy as np
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from pg2ch_spark.pipeline import _CollapsingSink

    rng = np.random.default_rng(seed)
    n = 60
    ops = rng.choice(["I", "U", "D"], n, p=[0.3, 0.5, 0.2])
    keys = rng.integers(1, 8, n)
    log = pd.DataFrame(
        {
            "key": keys.astype("int64"),
            "ver": range(1, n + 1),
            "op": ops,
            "value": rng.uniform(0, 50, n).round(3),
        }
    )
    # random batch boundaries (2-5 batches), contiguous in ver order
    cuts = sorted(rng.choice(range(5, n - 5), size=int(rng.integers(1, 4)), replace=False))
    batches = np.split(log, cuts)

    sink = _CollapsingSink(spark, str(tmp_path / "clog"), "key", "sign")
    for i, b in enumerate(batches):
        sink.merge(spark.createDataFrame(b), epoch_id=i)

    got = (
        sink.state()
        .groupBy("key")
        .agg(
            F.sum("sign").cast("bigint").alias("net_sign"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("sign") * F.col("value")), 2).alias("val_balance"),
        )
        .toPandas()
    )

    whole = spark.createDataFrame(log)
    w = Window.partitionBy("key").orderBy("ver")
    wp = whole.withColumn("prev_value", F.lag("value").over(w))
    plus = wp.where(F.col("op").isin("I", "U")).select(
        "key", "ver", "value", F.lit(1).alias("sign")
    )
    minus = wp.where(F.col("op").isin("U", "D")).select(
        "key", "ver", F.col("prev_value").alias("value"), F.lit(-1).alias("sign")
    )
    expected = (
        plus.unionByName(minus)
        .groupBy("key")
        .agg(
            F.sum("sign").cast("bigint").alias("net_sign"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("sign") * F.col("value")), 2).alias("val_balance"),
        )
        .toPandas()
    )
    r = compare_frames(f"carry-seed{seed}", got, expected)
    assert r.ok, str(r)
