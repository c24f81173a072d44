#!/usr/bin/env python
"""Paired same-session A/B of the r8 PPJoin positional filter
(VERDICT r8 item 1): old predicate (prefix + size window only) vs new
(plus the positional overlap bound), interleaved inside ONE idle
window, bracketed by the DuckDB oracle suite so the window certifies
its own measurement conditions.

Modes:
  --mode full        time the three consuming declared keys end-to-end
                     (noop sink), N interleaved rounds per arm
  --mode candidates  time ONLY the candidate stage (count() over the
                     candidate set) and record candidate-set sizes —
                     the quantity the filter actually shrinks

    python scripts/ppjoin_ab.py --mode full --rounds 4
    python scripts/ppjoin_ab.py --mode candidates --sf-dir /dev/shm/...x100u

The toggle is `positional=False` on the candidate builders — a
measurement hook; the result set is identical either way (the filter
is recall-lossless and the verify stage re-checks every candidate).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FULL_KEYS = [
    "text_near_dedup_ngram_jaccard",
    "text_containment_pairs",
    "dedup_cluster_components",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["full", "candidates"], default="full")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--no-oracle-bracket", action="store_true")
    args = ap.parse_args()

    from pg2ch_spark import registry
    from pg2ch_spark.llm import neardup
    from pg2ch_spark.session import get_spark

    spark = get_spark("ppjoin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    orig_j = neardup._candidates_jaccard
    orig_c = neardup._candidates_containment

    def set_positional(on: bool) -> None:
        if on:
            neardup._candidates_jaccard = orig_j
            neardup._candidates_containment = orig_c
        else:
            neardup._candidates_jaccard = lambda dg, t: orig_j(dg, t, positional=False)
            neardup._candidates_containment = lambda dg, c: orig_c(
                dg, c, positional=False
            )

    def oracle_sum() -> float:
        # serial DuckDB suite sum at sf0.1 — the same bracket bench.py
        # uses (always on the sf0.1 fixtures regardless of --sf-dir:
        # the bracket certifies the HOST, not the probe input)
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
        )
        from tests.oracle import duck_con

        con = duck_con(SF_DIR)
        tot = 0.0
        for key in sorted(registry.ORACLES):
            sql = registry.ORACLES[key]
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            tot += time.perf_counter() - t0
        con.close()
        return round(tot, 2)

    def run_full(key: str) -> float:
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ab:{key}")
        t0 = time.perf_counter()
        registry.QUERIES[key](spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    out: dict = {"mode": args.mode, "sf_dir": args.sf_dir}
    if not args.no_oracle_bracket:
        out["oracle_before_sec"] = oracle_sum()

    if args.mode == "full":
        results: dict[str, dict[str, list[float]]] = {
            k: {"on": [], "off": []} for k in FULL_KEYS
        }
        for key in FULL_KEYS:  # warm both arms once, untimed
            for on in (True, False):
                set_positional(on)
                run_full(key)
        for r in range(args.rounds):
            arms = [True, False] if r % 2 == 0 else [False, True]
            for on in arms:
                set_positional(on)
                for key in FULL_KEYS:
                    results[key]["on" if on else "off"].append(run_full(key))
        set_positional(True)
        out["per_key"] = {
            k: {
                "on_runs": v["on"],
                "off_runs": v["off"],
                "on_min": min(v["on"]),
                "off_min": min(v["off"]),
                "on_median": sorted(v["on"])[len(v["on"]) // 2],
                "off_median": sorted(v["off"])[len(v["off"]) // 2],
            }
            for k, v in results.items()
        }
    else:
        # Candidate stage only: build the shared docs_g once, then time
        # count() over each arm's candidate set, interleaved.
        import pyspark.sql.functions as F

        from pg2ch_spark import catalog
        from pg2ch_spark.caching import eager_persist
        from pg2ch_spark.llm.neardup import (
            _CONTAIN_MIN,
            _JACCARD_MIN,
            _collapse_exact,
            _ordered_grams,
            _shingles,
        )

        docs = catalog.load(spark, args.sf_dir, "documents")
        reps, _ = _collapse_exact(docs)
        t0 = time.perf_counter()
        docs_g = eager_persist(_ordered_grams(_shingles(reps)))
        out["docs_g_build_sec"] = round(time.perf_counter() - t0, 2)
        out["n_reps"] = docs_g.count()

        def cand_run(kind: str, on: bool) -> tuple[float, int]:
            gc.collect()
            spark.sparkContext.setJobDescription(f"cand:{kind}:{'on' if on else 'off'}")
            if kind == "jaccard":
                cand = orig_j(docs_g, _JACCARD_MIN, positional=on)
            else:
                cand = orig_c(docs_g, _CONTAIN_MIN, positional=on)
            t0 = time.perf_counter()
            n = cand.count()
            return round(time.perf_counter() - t0, 3), n

        res: dict[str, dict] = {}
        for kind in ("jaccard", "containment"):
            res[kind] = {"on_runs": [], "off_runs": []}
            for on in (True, False):  # warm, untimed
                cand_run(kind, on)
            for r in range(args.rounds):
                arms = [True, False] if r % 2 == 0 else [False, True]
                for on in arms:
                    dt, n = cand_run(kind, on)
                    res[kind]["on_runs" if on else "off_runs"].append(dt)
                    res[kind]["n_candidates_on" if on else "n_candidates_off"] = n
            res[kind]["on_min"] = min(res[kind]["on_runs"])
            res[kind]["off_min"] = min(res[kind]["off_runs"])
        out["candidates"] = res

    if not args.no_oracle_bracket:
        out["oracle_after_sec"] = oracle_sum()
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
