#!/usr/bin/env python
"""Micro A/B for VERDICT r8 item 5: the r9 column-wise Arrow-cast TSV
parse (`sources/pyds.py::_TsvReader.read` + escape-free fast path) vs
the r8 per-cell `convs[i](u)` parse, on the two fixture shapes the
declared keys exercise:

  typed    — escape-free typed rows (the stream_typed_spool /
             source_cdc_replay shape: long, timestamp, long, string,
             double) — the fast path + columnar casts both fire
  hostile  — the source_pyds_tsv corpus (every line carries raw
             TAB+BACKSLASH+NEWLINE escapes and every 7th lang is \\N)
             — the fast path never fires; only the columnar cast does

Pure-Python loop over the reader's read() (no Spark session): both
arms parse the identical files; outputs are asserted EQUAL batch by
batch. The r8 arm is loaded from git (dbd5ff6) at run time.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R8_REV = "dbd5ff6"


def load_old_pyds(repo: str):
    src = subprocess.run(
        ["git", "-C", repo, "show", f"{R8_REV}:pg2ch_spark/sources/pyds.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = os.path.join(tempfile.mkdtemp(prefix="pyds_r8_"), "pyds_r8.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("pyds_r8", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Schema:
    """Minimal stand-in for a StructType: .fields of (name, simpleString)."""

    class _F:
        def __init__(self, name, type_name):
            self.name = name
            self._t = type_name
            self.dataType = self

        def simpleString(self):
            return self._t

    def __init__(self, pairs):
        self.fields = [self._F(n, t) for n, t in pairs]


def make_typed(path: str, rows: int) -> None:
    from datetime import datetime, timedelta

    from pg2ch_spark.sources.clickhouse import escape_value

    t0 = datetime(2031, 3, 1)
    with open(path, "w") as f:
        for i in range(rows):
            ts = t0 + timedelta(seconds=i)
            f.write(
                f"{i}\t{escape_value(ts)}\t{i % 977}\tevt_{i % 13}\t{i * 0.25}\n"
            )


def make_hostile(path: str, rows: int) -> None:
    from pg2ch_spark.sources.clickhouse import encode_row

    with open(path, "w") as f:
        for i in range(rows):
            row = (i, f"doc text {i} body\t\\\n",
                   None if i % 7 == 0 else "en", f"src{i % 5}")
            f.write(encode_row(row) + "\n")


def parse_all(reader, part) -> tuple[float, list]:
    t0 = time.perf_counter()
    batches = list(reader.read(part))
    return time.perf_counter() - t0, batches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from pg2ch_spark.sources import pyds as pyds_new
    pyds_old = load_old_pyds(repo)

    tmp = tempfile.mkdtemp(prefix="tsv_ab_")
    typed = os.path.join(tmp, "typed.tsv")
    hostile = os.path.join(tmp, "hostile.tsv")
    make_typed(typed, args.rows)
    make_hostile(hostile, args.rows)

    cases = {
        "typed": (typed, _Schema([
            ("event_id", "bigint"), ("ts", "timestamp"),
            ("user_id", "bigint"), ("event_type", "string"),
            ("value", "double"),
        ])),
        "hostile": (hostile, _Schema([
            ("doc_id", "bigint"), ("text", "string"),
            ("lang", "string"), ("source", "string"),
        ])),
    }
    out = {"rows": args.rows}
    for case, (path, schema) in cases.items():
        opts = {"path": path}
        new_r = pyds_new._TsvReader(schema, opts)
        old_r = pyds_old._TsvReader(schema, opts)
        (new_part,) = new_r.partitions()
        (old_part,) = old_r.partitions()
        # equality check once (arrow batches -> python lists)
        _, nb = parse_all(new_r, new_part)
        _, ob = parse_all(old_r, old_part)
        flat_new = [r for b in nb for r in b.to_pylist()]
        flat_old = [r for b in ob for r in b.to_pylist()]
        assert flat_new == flat_old, f"{case}: outputs differ"
        news, olds = [], []
        for r in range(args.rounds):
            order = ((new_r, new_part, news), (old_r, old_part, olds))
            if r % 2:
                order = order[::-1]
            for rd, pt, acc in order:
                dt, _ = parse_all(rd, pt)
                acc.append(round(dt, 3))
        out[case] = {
            "new_runs": news, "old_runs": olds,
            "new_min": min(news), "old_min": min(olds),
            "speedup_min": round(min(olds) / min(news), 2),
            "rows_equal": True,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
