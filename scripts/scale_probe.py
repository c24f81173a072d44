#!/usr/bin/env python
"""Scale-up probe: replicate the sf0.1 fixtures Nx (default 10x) with
key offsets — a synthetic ~sf1 — and time the heaviest queries at both
scales. The point is the RATIO: an operator whose cost curve is the
declared one (linear scan/shuffle, near-linear candidate joins) shows
~Nx time at Nx rows; a hidden all-pairs or driver-side bottleneck shows
N^2 or OOM. Run by hand; results recorded in BASELINE.md.

    python scripts/scale_probe.py [--mult 10] [--keys k1,k2,...]

Replication keeps value distributions identical (each copy shifts only
the unique keys), so per-key group sizes scale by N exactly like a
bigger corpus would, while join fan-outs stay bounded — e.g. every
text document appears N times, which ALSO stresses the near-dup path
with true duplicate clusters of size N.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Unique/key columns to offset per copy so replicated rows stay distinct
# where the schema promises distinctness (text content is intentionally
# left identical — that is the duplication stress).
_OFFSETS = {
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
    "orders": {"o_orderkey": 100_000_000},
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "nation": {},
    "region": {},
}

DEFAULT_KEYS = [
    "text_near_dedup_simhash",
    "text_near_dedup_minhash",
    "text_near_dedup_ngram_jaccard",
    "text_decontaminate",
    "text_lang_id",
    "text_fingerprint",
    "events_sessionize",
    "events_window_funnel",
    "agg_groupby_q1",
    "join_multiway_star",
    "sim_lsh_hyperplane",
    "sim_ann_ivf",
    "agg_argmax",
    "win_topk_per_group",
    # round 3: the join/window-heaviest composites and the new corpus ops
    "query_tpch_q5",
    "query_tpch_q9",
    "query_tpch_q13",
    "query_tpch_q17",
    "query_tpch_q21",
    "text_repetition_signals",
    "text_vocab_heavy_hitters",
    "events_gap_fill",
    "dedup_cluster_components",
    # round 4: pipeline-prep, derived-partsupp, path/markov, sinks
    "text_bpe_merge_candidates",
    "pipeline_mix_weighted",
    "pipeline_length_buckets",
    "dedup_incremental_snapshot",
    "corpus_mixture_entropy",
    "events_top_paths",
    "events_transition_matrix",
    "join_asof_nearest",
    "query_tpch_q2",
    "query_tpch_q11",
    "query_tpch_q20",
    "cdc_bucketed_compaction",
    "sim_pca_power_component",
]


def replicate(spark, src: str, dst: str, mult: int, salt_payloads: bool = False) -> None:
    """salt_payloads=False (default): copies keep IDENTICAL payloads —
    the duplicate-density stress (every text gains mult exact copies,
    which is what breaks un-collapsed band buckets). salt_payloads=True
    probes the COMPLEMENTARY axis: each copy's text gets a per-copy
    suffix token and each embedding a per-copy first-dim nudge, so
    payloads are (near-)distinct and the exact-dup collapse is a no-op
    — shingle/signature tables then carry TRUE row scale, which is the
    stress the spillable persists exist for."""
    os.makedirs(dst, exist_ok=True)
    for table, offs in _OFFSETS.items():
        path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if not offs:  # tiny dims: one copy, same content
            out = df
        else:
            # one scan × broadcast copy-index, not a mult-way union —
            # a 1000-branch union plan chokes on planning alone
            idx = F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("_i")
            # spread the few input splits BEFORE the mult-x explode so
            # no single write task owns mult/n_splits of the output
            out = df.repartition(128).select("*", idx)
            for col, step in offs.items():
                out = out.withColumn(col, F.col(col) + F.col("_i").cast("long") * step)
            if salt_payloads and table == "documents":
                out = out.withColumn(
                    "text", F.concat_ws(" ", "text", F.concat(F.lit("u"), F.col("_i")))
                )
            if salt_payloads and table == "embeddings":
                out = out.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> IF(j = 0, "
                        "CAST(x + _i * 1e-4 AS FLOAT), x))"
                    ),
                )
            out = out.drop("_i")
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--keys", default=None)
    ap.add_argument("--scratch", default="/dev/shm/pg2ch_scale_probe")
    ap.add_argument(
        "--reuse",
        action="store_true",
        help="reuse (and keep) an existing replicated scratch dir",
    )
    ap.add_argument(
        "--salt-payloads",
        action="store_true",
        help="make each copy's text/embedding (near-)distinct: probes "
        "the unique-dense axis where exact-dup collapse is a no-op "
        "(separate scratch subdir; see replicate())",
    )
    args = ap.parse_args()

    from pg2ch_spark import registry
    from pg2ch_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    keys = args.keys.split(",") if args.keys else DEFAULT_KEYS

    suffix = "u" if args.salt_payloads else ""
    big = os.path.join(args.scratch, f"x{args.mult}{suffix}")
    if args.reuse and os.path.exists(os.path.join(big, "lineitem.parquet")):
        print(f"reusing {big}")
    else:
        t0 = time.perf_counter()
        replicate(spark, SF_DIR, big, args.mult, salt_payloads=args.salt_payloads)
        print(f"replicated {args.mult}x into {big} in {time.perf_counter() - t0:.1f}s")

    def timed(key: str, sf_dir: str) -> float:
        t = time.perf_counter()
        registry.QUERIES[key](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t

    out = {}
    for key in keys:
        timed(key, SF_DIR)  # warm
        base = timed(key, SF_DIR)
        scaled = timed(key, big)
        out[key] = {
            "base_sec": round(base, 2),
            f"x{args.mult}_sec": round(scaled, 2),
            "ratio": round(scaled / base, 1) if base > 0 else None,
        }
        print(key, json.dumps(out[key]), flush=True)

    print(json.dumps({"mult": args.mult, "results": out}))
    if not args.reuse:
        shutil.rmtree(args.scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
