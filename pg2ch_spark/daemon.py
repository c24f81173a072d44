"""Daemon lifecycle — the long-running replicator process (SURVEY
§2.1 R15, pg2ch `cmd/pg2ch/main.go` entry/lifecycle analog).

pg2ch's main loop: load config, connect, then consume the WAL stream
until interrupted; SIGTERM/SIGINT trigger a graceful stop that flushes
buffers and persists the slot position before exiting. Here each
iteration is an availableNow catch-up pass of `run_pipeline` (process
everything new, flush the engine sinks, commit the streaming
checkpoint), then sleep `poll_interval_s` and repeat. A signal sets a
stop flag; the in-flight pass always runs to its checkpointed
completion — the flush-and-checkpoint is the unit of progress, so a
mid-run SIGTERM can never leave a half-applied batch (replays resume
from the last committed checkpoint into idempotent merges).

Per-pass progress goes to stdout as one JSON line so an operator (or
the e2e test) can follow the daemon without scraping Spark logs.
"""

from __future__ import annotations

import json
import signal
import sys
import threading

from pyspark.sql import SparkSession

from pg2ch_spark.config import DaemonConfig
from pg2ch_spark.pipeline import run_pipeline


def build_session(cfg: DaemonConfig) -> SparkSession:
    return (
        SparkSession.builder.master(cfg.spark.master)
        .appName(cfg.spark.app_name)
        .config("spark.sql.shuffle.partitions", str(cfg.spark.shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def install_signal_handlers(stop: threading.Event) -> None:
    """SIGTERM/SIGINT -> set the stop flag (graceful stop after the
    in-flight pass commits). Only possible from the main thread; callers
    embedding the daemon elsewhere pass their own stop event instead."""

    def handler(signum, frame):  # noqa: ARG001
        stop.set()

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)


def run_daemon(
    cfg: DaemonConfig,
    spark: SparkSession,
    *,
    once: bool = False,
    max_passes: int | None = None,
    stop: threading.Event | None = None,
    out=None,
) -> int:
    """Run catch-up passes until stopped. Returns a process exit code.

    ``once`` is the batch mode (single catch-up pass, then exit) —
    pg2ch has no direct analog but every CDC daemon grows one; it is
    also what a scheduler invokes. ``max_passes`` bounds continuous
    mode for tests."""
    out = out or sys.stdout
    stop = stop or threading.Event()
    n_pass = 0
    while True:
        res = run_pipeline(
            spark,
            cfg.tables,
            cfg.source_dir,
            cfg.state_root,
            max_files_per_trigger=cfg.max_files_per_trigger,
            source_format=cfg.source_format,
        )
        n_pass += 1
        stopping = stop.is_set() or once or (max_passes is not None and n_pass >= max_passes)
        print(
            json.dumps(
                {"pass": n_pass, "batches": res.batches, "stopping": stopping}
            ),
            file=out,
            flush=True,
        )
        if stopping:
            return 0
        # interruptible sleep: a signal during the pause exits promptly
        # (the pass just committed, nothing is in flight)
        if stop.wait(cfg.poll_interval_s):
            print(
                json.dumps({"pass": n_pass, "batches": {}, "stopping": True}),
                file=out,
                flush=True,
            )
            return 0
