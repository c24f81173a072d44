"""Group F — sort / limit / top-k (SURVEY §2.3 F).

Scale note: a global ORDER BY + LIMIT compiles to TakeOrderedAndProject
— each partition keeps its local top-k, the driver merges k·p rows —
no global sort materializes. Verified in tests/test_plans.py. Both
queries carry unique-key tie-breaks (D1) so the row *set* is stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


@register(
    "sort_multikey_nulls",
    oracle="""
    SELECT o_orderkey, nullif(o_orderpriority, '5-LOW') AS prio
    FROM orders
    ORDER BY prio ASC NULLS FIRST, o_orderkey DESC
    LIMIT 50
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.nullif("o_orderpriority", F.lit("5-LOW")).alias("prio"))
        .orderBy(F.col("prio").asc_nulls_first(), F.col("o_orderkey").desc())
        .limit(50)
    )


@register(
    "limit_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
