#!/usr/bin/env python
"""Paired A/B for VERDICT r8 item 3: fold the `docs_g` eager_persist
count pass into the first consumer (lazy persist) vs the committed
eager materialization.

Arms, toggled by monkeypatching ``neardup.eager_persist`` for the
docs_g call site only (the collapse-table call sites keep the real
eager_persist in BOTH arms — the salted-100x broadcast hazard the
caching.py policy guards against lives there):

  eager  — committed behavior: docs_g.persist(); docs_g.count()
           (one dedicated job), then `sh` released before the main job
  lazy   — docs_g.persist() only; the key's single main job
           materializes the cache on first touch. `sh` must then stay
           persisted through that job (its two docs_g branches would
           otherwise recompute the shingle stream), so the lazy arm
           also measures the cost of NOT being able to release sh.

Times the three consuming declared keys end-to-end (noop sink),
interleaved rounds, plus the candidate-stage count in isolation.
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

KEYS = [
    "text_near_dedup_ngram_jaccard",
    "text_containment_pairs",
    "dedup_cluster_components",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from pyspark.storagelevel import StorageLevel

    from pg2ch_spark import registry
    from pg2ch_spark.llm import neardup
    from pg2ch_spark.session import get_spark

    spark = get_spark("ordered-grams-fold-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    orig_rps = neardup._rep_pair_scores

    def lazy_rep_pair_scores(reps, keep, prefilter):
        # identical to neardup._rep_pair_scores except: docs_g persist
        # is LAZY and sh stays persisted (no materialization job).
        import pyspark.sql.functions as F

        kind, threshold = prefilter
        sh = neardup._shingles(reps).persist(StorageLevel.MEMORY_AND_DISK)
        docs_g = neardup._ordered_grams(sh).persist(StorageLevel.MEMORY_AND_DISK)
        sz = docs_g.select("doc_id", "n")
        if kind == "jaccard":
            cand = neardup._candidates_jaccard(docs_g, threshold)
        else:
            cand = neardup._candidates_containment(docs_g, threshold)
        hashed = F.expr("transform(grams, x -> xxhash64(x))")
        gha = docs_g.select(F.col("doc_id").alias("doc_a"), hashed.alias("_ha"))
        ghb = docs_g.select(F.col("doc_id").alias("doc_b"), hashed.alias("_hb"))
        scored = (
            cand.join(gha, "doc_a")
            .join(ghb, "doc_b")
            .select(
                "doc_a", "doc_b", "n_a", "n_b",
                F.size(F.array_intersect("_ha", "_hb")).alias("ni"),
            )
            .where(F.col("ni") > 0)
        )
        cont = F.col("ni").cast("double") / F.least(F.col("n_a"), F.col("n_b"))
        jac = F.col("ni").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("ni"))
        rep_pairs = (
            scored.where(keep(cont, jac))
            .select(
                "doc_a", "doc_b",
                F.round(cont, 4).alias("containment"),
                F.round(jac, 4).alias("jaccard"),
            )
        )
        return rep_pairs, sz

    def set_lazy(on: bool) -> None:
        neardup._rep_pair_scores = lazy_rep_pair_scores if on else orig_rps
        # dedup_cluster_components imports _rep_pair_scores from the
        # module at call time, so the patch reaches it too.

    def run_key(key: str) -> float:
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"fold:{key}")
        t0 = time.perf_counter()
        registry.QUERIES[key](spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    results = {k: {"eager": [], "lazy": []} for k in KEYS}
    for key in KEYS:  # warm both arms, untimed
        for lazy in (False, True):
            set_lazy(lazy)
            run_key(key)
    for r in range(args.rounds):
        arms = [False, True] if r % 2 == 0 else [True, False]
        for lazy in arms:
            set_lazy(lazy)
            for key in KEYS:
                results[key]["lazy" if lazy else "eager"].append(run_key(key))
    set_lazy(False)
    out = {
        "sf_dir": args.sf_dir,
        "per_key": {
            k: {
                "eager_runs": v["eager"],
                "lazy_runs": v["lazy"],
                "eager_min": min(v["eager"]),
                "lazy_min": min(v["lazy"]),
                "eager_median": sorted(v["eager"])[len(v["eager"]) // 2],
                "lazy_median": sorted(v["lazy"])[len(v["lazy"]) // 2],
            }
            for k, v in results.items()
        },
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
