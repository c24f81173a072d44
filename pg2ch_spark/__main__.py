"""``python -m pg2ch_spark --config replication.yaml`` — the CLI the
reference ships as its single binary (``pg2ch --config config.yaml``,
SURVEY §2.1 R14+R15).

Modes:
  (default)      continuous daemon: catch-up pass, sleep, repeat;
                 SIGTERM/SIGINT stop gracefully after the in-flight
                 pass flushes and checkpoints.
  --once         single catch-up pass, then exit (cron/scheduler mode).
  --validate     parse + validate the config and exit without starting
                 Spark (the `pg2ch -check-config` style preflight).
"""

from __future__ import annotations

import argparse
import sys
import threading

from pg2ch_spark.config import load_config
from pg2ch_spark.daemon import build_session, install_signal_handlers, run_daemon


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pg2ch_spark", description=__doc__)
    p.add_argument("--config", required=True, help="YAML config file path")
    p.add_argument("--once", action="store_true", help="one catch-up pass, then exit")
    p.add_argument(
        "--max-passes", type=int, default=None, help="stop after N passes (testing)"
    )
    p.add_argument("--validate", action="store_true", help="validate config and exit")
    args = p.parse_args(argv)

    try:
        cfg = load_config(args.config)
    except (ValueError, FileNotFoundError, TypeError) as e:
        print(f"config error: {e}", file=sys.stderr)
        return 2
    if args.validate:
        print(f"config OK: {len(cfg.tables)} table(s)")
        return 0

    stop = threading.Event()
    install_signal_handlers(stop)
    spark = build_session(cfg)
    try:
        return run_daemon(
            cfg, spark, once=args.once, max_passes=args.max_passes, stop=stop
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
