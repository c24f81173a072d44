#!/usr/bin/env python
"""Dump `.explain("formatted")` for declared keys to plans/<out>/ —
the committed evidence files the judge checks plan claims against.

    python scripts/dump_plans.py --out plans/r09 --suffix _after \
        --keys dedup_cluster_components,...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--out", default="plans/r09")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    from pg2ch_spark import registry
    from pg2ch_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(root, args.out)
    os.makedirs(outdir, exist_ok=True)
    for key in args.keys.split(","):
        df = registry.QUERIES[key](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{key}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{path}: {plan.count('Exchange')} Exchange mentions")
    spark.stop()


if __name__ == "__main__":
    main()
