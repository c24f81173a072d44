"""Group G — set operations (SURVEY §2.3 G).

Scale note: UNION ALL is a zero-shuffle concatenation of scans;
INTERSECT/EXCEPT/UNION DISTINCT each cost one hash-dedup shuffle on
the full projected row — keep the projection narrow before the set op
so only the needed columns shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


def _slice_f(o: DataFrame) -> DataFrame:
    return o.where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)).select(
        "o_orderkey", "o_totalprice"
    )


def _slice_urgent(o: DataFrame) -> DataFrame:
    return o.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 200000)
    ).select("o_orderkey", "o_totalprice")


_SLICES_SQL = """
    (SELECT o_orderkey, o_totalprice FROM orders
     WHERE o_orderstatus = 'F' AND o_totalprice > 200000)
    {op}
    (SELECT o_orderkey, o_totalprice FROM orders
     WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000)
"""


@register("set_union_all", oracle=_SLICES_SQL.format(op="UNION ALL"))
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    return _slice_f(o).unionByName(_slice_urgent(o))


@register("set_union_distinct", oracle=_SLICES_SQL.format(op="UNION"))
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    return _slice_f(o).unionByName(_slice_urgent(o)).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996."""
    o = catalog.load(spark, sf_dir, "orders")
    y95 = o.where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey")
    y96 = o.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    return y95.intersect(y96)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1995 but not 1996 (distinct EXCEPT)."""
    o = catalog.load(spark, sf_dir, "orders")
    y95 = o.where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey")
    y96 = o.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    return y95.subtract(y96)
