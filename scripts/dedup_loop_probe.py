#!/usr/bin/env python
"""Probe for VERDICT r8 item 4: does pre-partitioning `edges` on the
loop's join key actually remove the edges-side Exchange from every
label-propagation round, and what does a round cost each way?

Builds the dedup_cluster_components edge/label tables at --sf-dir,
then for each edges variant:
  a) checkpoint            (r8 baseline: plain localCheckpoint)
  b) repart+checkpoint     (repartition(doc_b) before localCheckpoint)
  c) repart+sort+persist   (repartition + sortWithinPartitions +
                            eager_persist — InMemoryRelation preserves
                            partitioning AND ordering; AQE cannot
                            change cached-plan output partitioning)
prints ONE round's physical plan shape (exchange/sort counts) and the
timed wall of the full fixpoint loop, interleaved across variants.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--plan-out", default=None, help="dir for plan dumps")
    args = ap.parse_args()

    from pg2ch_spark import catalog, registry
    from pg2ch_spark.caching import eager_persist
    from pg2ch_spark.llm.neardup import _JACCARD_MIN, _rep_pair_scores
    from pg2ch_spark.session import get_spark

    spark = get_spark("dedup-loop-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    catalog.configure(spark)
    catalog.tune(spark)

    docs = catalog.load(spark, args.sf_dir, "documents")
    h = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("th"))
    rep_map = h.groupBy("th").agg(F.min("doc_id").alias("rep"))
    mem = h.join(rep_map, "th").select("doc_id", "rep").localCheckpoint(eager=True)
    reps = docs.join(
        mem.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    ident = mem.where(F.col("doc_id") != F.col("rep")).select(
        F.col("doc_id").alias("doc_a"), F.col("rep").alias("doc_b")
    )
    rep_pairs, _ = _rep_pair_scores(
        reps, lambda cont, jac: jac >= _JACCARD_MIN, ("jaccard", _JACCARD_MIN)
    )
    pairs = (
        rep_pairs.select("doc_a", "doc_b").unionByName(ident).localCheckpoint(eager=True)
    )
    sym = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def make_edges(variant: str):
        if variant == "checkpoint":
            return sym.localCheckpoint(eager=True)
        if variant == "repart_checkpoint":
            return sym.repartition(n_shuffle, "doc_b").localCheckpoint(eager=True)
        if variant == "repart_sort_persist":
            return eager_persist(
                sym.repartition(n_shuffle, "doc_b").sortWithinPartitions("doc_b")
            )
        raise ValueError(variant)

    def round_plan(edges, labels):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc)
            .groupBy(edges.doc_a.alias("doc"))
            .agg(F.min("label").alias("nlabel"))
        )
        return labels.join(neighbor_min, "doc", "left").select(
            "doc",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )

    def loop_wall(edges) -> tuple[float, int]:
        from pyspark.sql import Observation

        labels = (
            edges.select(F.col("doc_a").alias("doc"))
            .distinct()
            .select("doc", F.col("doc").alias("label"))
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        nrounds = 0
        for _ in range(20):
            nrounds += 1
            neighbor_min = (
                edges.join(labels, edges.doc_b == labels.doc)
                .groupBy(edges.doc_a.alias("doc"))
                .agg(F.min("label").alias("nlabel"))
            )
            obs = Observation()
            new_labels = (
                labels.join(neighbor_min, "doc", "left")
                .select(
                    "doc",
                    F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
                    (F.coalesce("nlabel", "label") < F.col("label")).alias("chg"),
                )
                .observe(obs, F.sum(F.col("chg").cast("long")).alias("n_chg"))
                .localCheckpoint(eager=True)
            )
            labels = new_labels.drop("chg")
            if not (obs.get["n_chg"] or 0):
                break
        return round(time.perf_counter() - t0, 3), nrounds

    variants = ["checkpoint", "repart_checkpoint", "repart_sort_persist"]
    out: dict = {}
    plans: dict[str, str] = {}
    for v in variants:
        edges = make_edges(v)
        labels0 = (
            edges.select(F.col("doc_a").alias("doc"))
            .distinct()
            .select("doc", F.col("doc").alias("label"))
            .localCheckpoint(eager=True)
        )
        df = round_plan(edges, labels0)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plans[v] = plan
        out[v] = {
            "round_exchanges": len(
                re.findall(r"Exchange (?:hash|range|RoundRobin)", plan)
            ),
            "round_sorts": plan.count("(Sort ") + len(re.findall(r"\bSort \(", plan)),
            "walls": [],
        }
        if v.endswith("persist"):
            edges.unpersist()

    # interleaved timed loops
    built = {}
    for r in range(args.rounds):
        order = variants if r % 2 == 0 else list(reversed(variants))
        for v in order:
            gc.collect()
            if v not in built:
                built[v] = make_edges(v)
            w, nr = loop_wall(built[v])
            out[v]["walls"].append(w)
            out[v]["n_rounds"] = nr
    for v in variants:
        out[v]["wall_min"] = min(out[v]["walls"])

    if args.plan_out:
        os.makedirs(args.plan_out, exist_ok=True)
        for v, p in plans.items():
            with open(os.path.join(args.plan_out, f"dedup_loop_round_{v}.txt"), "w") as f:
                f.write(p)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
