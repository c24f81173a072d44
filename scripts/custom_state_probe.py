#!/usr/bin/env python
"""Probe: applyInPandasWithState at production key counts (VERDICT r4
item 5). The per-group Python machinery of `stream_custom_state` costs
~1.8s at 2k keys; this measures whether that overhead amortizes at
100k+ keys, against the JVM window-scan expressing identical semantics
(the oracle plan) as the reference point.

    python scripts/custom_state_probe.py [--keys 100000] [--events-per-key 20]

Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyspark.sql.functions as F


def synth(path: str, n_keys: int, per_key: int, seed: int = 5) -> None:
    rng = np.random.default_rng(seed)
    n = n_keys * per_key
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "user_id": rng.integers(0, n_keys, size=n).astype(np.int64),
            "value": rng.normal(size=n),
        }
    )
    os.makedirs(path, exist_ok=True)
    df.to_parquet(os.path.join(path, "part-0.parquet"))


def python_state_path(spark, path, state_partitions: int):
    """The applyInPandasWithState peak fold of stream_custom_state,
    pointed at the synthetic stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from pg2ch_spark.streaming.runner import run_complete_to_df

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_peaks", LongType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("running_max", DoubleType()), StructField("n_peaks", LongType())]
    )

    def fold_peaks(key, batches, state: GroupState):
        if state.exists:
            running_max, n_peaks = state.get
        else:
            running_max, n_peaks = None, 0
        for pdf in batches:
            v = pdf.sort_values("event_id")["value"].to_numpy()
            if not len(v):
                continue
            seed = -np.inf if running_max is None else running_max
            prior = np.maximum.accumulate(np.concatenate(([seed], v)))[:-1]
            n_peaks += int((v > prior).sum())
            running_max = float(max(seed, v.max()))
        state.update((running_max, n_peaks))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_peaks": [n_peaks], "max_value": [running_max]}
        )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    return run_complete_to_df(
        spark,
        os.path.join(path, "part-0.parquet"),
        schema,
        lambda df: df.groupBy("user_id").applyInPandasWithState(
            fold_peaks,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        ),
        output_mode="update",
        state_partitions=state_partitions,
    )


def jvm_window_path(spark, path):
    """Identical semantics as a JVM window scan (the oracle plan)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(path, "part-0.parquet"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = ev.withColumn("prior_max", F.max("value").over(w))
    return scored.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("prior_max").isNull() | (F.col("value") > F.col("prior_max")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_peaks"),
        F.max("value").alias("max_value"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--events-per-key", type=int, default=20)
    ap.add_argument("--scratch", default="/dev/shm/pg2ch_state_probe")
    args = ap.parse_args()

    from pg2ch_spark.session import get_spark

    spark = get_spark("custom-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    synth(args.scratch, args.keys, args.events_per_key)
    n_rows = args.keys * args.events_per_key
    print(f"{args.keys} keys x {args.events_per_key} events = {n_rows} rows")

    t0 = time.perf_counter()
    jvm = jvm_window_path(spark, args.scratch)
    jvm_rows = jvm.count()
    jvm_t = time.perf_counter() - t0
    total_peaks_jvm = jvm.agg(F.sum("n_peaks")).collect()[0][0]
    print(f"jvm_window: {jvm_t:.2f}s ({jvm_rows} keys)")

    for parts in (8, 16, 32):
        t0 = time.perf_counter()
        res = python_state_path(spark, args.scratch, parts)
        got_rows = res.count()
        dt = time.perf_counter() - t0
        total_peaks = res.agg(F.sum("n_peaks")).collect()[0][0]
        ok = got_rows == jvm_rows and total_peaks == total_peaks_jvm
        print(
            f"applyInPandasWithState parts={parts}: {dt:.2f}s "
            f"({got_rows} keys, {n_rows / dt:,.0f} rows/s, "
            f"match_jvm={ok})"
        )

    shutil.rmtree(args.scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
