"""CLI daemon e2e (R14/R15): a user runs the replicator the way pg2ch
users do — one YAML file, one process — and the daemon replicates every
configured table, survives a mid-run SIGTERM with a clean
flush-and-checkpoint stop, and resumes from the checkpoint on restart.

Two subprocesses total (each pays one Spark startup): a continuous
daemon that gets SIGTERMed mid-run, then a --once catch-up run that
must find the checkpoints already at the head of the log.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import duckdb
import pandas as pd
import pytest
import yaml

from pg2ch_spark.config import config_from_mapping, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CDC_SQL = """
    SELECT user_id AS key, event_id AS ver,
           CASE event_type WHEN 'signup' THEN 'I'
                           WHEN 'error'  THEN 'D'
                           ELSE 'U' END AS op,
           value
    FROM read_parquet('{path}/events.parquet/*.parquet')
"""


@pytest.fixture(scope="module")
def daemon_dirs(tmp_path_factory):
    """Events fixture (two files -> two micro-batches at
    maxFilesPerTrigger=1), a YAML config, and a state root."""
    t0 = pd.Timestamp("2024-03-01")
    script = [
        (1, "signup"), (2, "signup"), (1, "view"), (3, "view"),
        (2, "purchase"), (1, "error"), (4, "signup"), (2, "view"),
        (1, "signup"), (3, "error"), (4, "click"), (2, "error"),
        (5, "view"), (4, "purchase"), (5, "signup"), (1, "click"),
    ]
    rows = [
        (i, t0 + pd.Timedelta(seconds=10 * i), u, et, float(i), '{"k":1}')
        for i, (u, et) in enumerate(script, start=1)
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path_factory.mktemp("cli_daemon")
    table_dir = os.path.join(d, "events.parquet")
    os.makedirs(table_dir)
    df.iloc[:8].to_parquet(os.path.join(table_dir, "part-0.parquet"))
    df.iloc[8:].to_parquet(os.path.join(table_dir, "part-1.parquet"))

    state_root = os.path.join(d, "state")
    cfg = {
        "spark": {"master": "local[2]", "shuffle_partitions": 2,
                  "app_name": "pg2ch-cli-e2e"},
        "source": {"sf_dir": str(d), "max_files_per_trigger": 1},
        "state_root": state_root,
        "poll_interval_s": 0.05,
        "tables": {
            "t_replacing": {"engine": "ReplacingMergeTree"},
            "t_collapsing": {"engine": "CollapsingMergeTree"},
            "t_append": {"engine": "MergeTree"},
        },
    }
    cfg_path = os.path.join(d, "replication.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return str(d), cfg_path, state_root


def _spawn(cfg_path, *extra):
    return subprocess.Popen(
        [sys.executable, "-m", "pg2ch_spark", "--config", cfg_path, *extra],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
    )


def test_validate_mode_and_config_errors(daemon_dirs, tmp_path):
    _, cfg_path, _ = daemon_dirs
    # --validate parses without starting Spark (fast enough to run inline)
    out = subprocess.run(
        [sys.executable, "-m", "pg2ch_spark", "--config", cfg_path, "--validate"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode == 0 and "3 table(s)" in out.stdout
    # a typo'd knob is a hard error, not a silent default
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        yaml.safe_dump({
            "source": {"sf_dir": "/x"}, "state_root": "/y",
            "tables": {"t": {"engine": "ReplacingMergeTree", "key_cols": "k"}},
        })
    )
    out = subprocess.run(
        [sys.executable, "-m", "pg2ch_spark", "--config", str(bad), "--validate"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode == 2 and "key_cols" in out.stderr


def test_config_loader_rejections(daemon_dirs):
    d, cfg_path, _ = daemon_dirs
    cfg = load_config(cfg_path)
    assert [s.main_table for s in cfg.tables] == [
        "t_replacing", "t_collapsing", "t_append"
    ]
    base = {"source": {"sf_dir": d}, "state_root": d, "tables": {"t": {}}}
    with pytest.raises(ValueError, match="unknown config keys"):
        config_from_mapping({**base, "tablez": {}})
    with pytest.raises(ValueError, match="missing required key 'sf_dir'"):
        config_from_mapping({**base, "source": {}})
    with pytest.raises(ValueError, match="tables.t: unknown TableSpec"):
        config_from_mapping({**base, "tables": {"t": {"nope": 1}}})
    with pytest.raises(ValueError, match="conflicts"):
        config_from_mapping({**base, "tables": {"t": {"main_table": "other"}}})
    with pytest.raises(ValueError, match="max_files_per_trigger"):
        config_from_mapping(
            {**base, "source": {"sf_dir": d, "max_files_per_trigger": 0}}
        )
    # spark block VALUE types: a config that only crashes at
    # SparkSession.builder must fail --validate preflight instead
    with pytest.raises(ValueError, match="shuffle_partitions"):
        config_from_mapping({**base, "spark": {"shuffle_partitions": "many"}})
    with pytest.raises(ValueError, match="spark.master"):
        config_from_mapping({**base, "spark": {"master": ["local"]}})


def test_config_walsender_and_clickhouse_blocks(daemon_dirs):
    d, _, _ = daemon_dirs
    base = {"source": {"sf_dir": d}, "state_root": d, "tables": {"t": {}}}
    ws = {"host": "h", "port": 5432, "slot": "s", "publication": "p"}

    # a walsender source implies (and forces) the cdc spool format
    cfg = config_from_mapping(
        {**base, "source": {"sf_dir": d, "walsender": dict(ws)}}
    )
    assert cfg.source_format == "cdc" and cfg.walsender.slot == "s"
    with pytest.raises(ValueError, match="requires source.format: cdc"):
        config_from_mapping(
            {**base, "source": {"sf_dir": d, "format": "events", "walsender": dict(ws)}}
        )
    with pytest.raises(ValueError, match="missing required key 'slot'"):
        config_from_mapping(
            {**base, "source": {"sf_dir": d, "walsender": {"host": "h", "port": 1, "publication": "p"}}}
        )
    with pytest.raises(ValueError, match="port must be an int"):
        config_from_mapping(
            {**base, "source": {"sf_dir": d, "walsender": {**ws, "port": "5432"}}}
        )
    with pytest.raises(ValueError, match="unknown source.walsender keys"):
        config_from_mapping(
            {**base, "source": {"sf_dir": d, "walsender": {**ws, "password": "x"}}}
        )  # secrets in YAML are rejected by name: password_env only

    cfg = config_from_mapping({**base, "clickhouse": {"endpoint": "http://ch:8123"}})
    assert cfg.clickhouse.database == "default"
    with pytest.raises(ValueError, match="missing required key 'endpoint'"):
        config_from_mapping({**base, "clickhouse": {"database": "db"}})
    with pytest.raises(ValueError, match="unknown clickhouse keys"):
        config_from_mapping(
            {**base, "clickhouse": {"endpoint": "e", "table": "t"}}
        )


def test_daemon_sigterm_then_resume(daemon_dirs):
    d, cfg_path, state_root = daemon_dirs

    # -- phase 1: continuous daemon, SIGTERM after the first pass lands
    proc = _spawn(cfg_path)
    try:
        first = json.loads(proc.stdout.readline())
        assert first["pass"] == 1
        # two files, maxFilesPerTrigger=1 -> two micro-batches per table
        assert first["batches"] == {
            "t_replacing": 2, "t_collapsing": 2, "t_append": 2
        }
        proc.send_signal(signal.SIGTERM)  # mid-run: pass 2+ may be in flight
        lines = [json.loads(ln) for ln in proc.stdout if ln.strip()]
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, "SIGTERM must exit cleanly after flush-and-checkpoint"
    assert lines and lines[-1]["stopping"] is True
    # later passes see no new files: zero batches
    assert all(
        all(n == 0 for n in ln["batches"].values()) for ln in lines if ln["batches"]
    )

    # -- on-disk state is the replicated result, readable without Spark
    con = duckdb.connect()
    cdc = CDC_SQL.format(path=d)
    expected = con.execute(
        f"""SELECT key, ver, op, value FROM (
               SELECT *, row_number() OVER (PARTITION BY key ORDER BY ver DESC) rn
               FROM ({cdc})) WHERE rn = 1 ORDER BY key"""
    ).df().drop(columns=[])
    got = con.execute(
        f"""SELECT key, ver, op, value
            FROM read_parquet('{state_root}/t_replacing/state/*.parquet')
            ORDER BY key"""
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expected.reset_index(drop=True),
        check_dtype=False,
    )
    # append log carries the full change stream
    n_events = con.execute(f"SELECT count(*) FROM ({cdc})").fetchone()[0]
    n_append = con.execute(
        f"""SELECT count(*) FROM
            read_parquet('{state_root}/t_append/state/*/*.parquet')"""
    ).fetchone()[0]
    assert n_append == n_events
    # collapsing signed log: +1 per I/U, -1 per U/D
    plus, minus = con.execute(
        f"""SELECT sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END),
                   sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END)
            FROM read_parquet('{state_root}/t_collapsing/state/*/*.parquet')"""
    ).fetchone()
    ops = dict(
        con.execute(f"SELECT op, count(*) FROM ({cdc}) GROUP BY op").fetchall()
    )
    assert plus == ops.get("I", 0) + ops.get("U", 0)
    assert minus == ops.get("U", 0) + ops.get("D", 0)

    # -- phase 2: restart resumes from the checkpoint (no re-processing)
    proc = _spawn(cfg_path, "--once")
    try:
        line = json.loads(proc.stdout.readline())
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0
    assert line["batches"] == {"t_replacing": 0, "t_collapsing": 0, "t_append": 0}
    # state untouched by the no-op pass
    got2 = con.execute(
        f"""SELECT key, ver, op, value
            FROM read_parquet('{state_root}/t_replacing/state/*.parquet')
            ORDER BY key"""
    ).df()
    pd.testing.assert_frame_equal(got2, got)
