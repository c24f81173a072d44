"""Group B — projection / filter / predicates (SURVEY §2.3 B).

pg2ch parity: R11 type cast/encode (`pkg/utils/chutils` — PG values →
CH literals) generalizes to Catalyst cast/projection expressions; the
per-engine row shaping in `pkg/tableengines` is a fixed projection.

Scale notes: all four queries are narrow map-side pipelines — no
shuffle, fully whole-stage-codegen'd, predicates pushed into the
parquet scan. These are the operators where staying JVM-side matters
most; no Python touches the row path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


@register(
    "project_expr_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           CAST(l_quantity AS INTEGER) AS qty_int,
           l_returnflag AS flag
    FROM lineitem
    """,
)
def project_expr_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # price (2dp-exact) × (1-discount) (2dp-exact) is 4dp-exact: rounding
        # at 4dp is unambiguous in both engines; at 2dp it hits half-way
        # cases where Spark (decimal-repr HALF_UP) and DuckDB (binary
        # rounding) disagree. Determinism rule D2, refined.
        F.round(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4).alias("revenue"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_returnflag").alias("flag"),
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE (p_type LIKE 'PROMO%' AND p_size BETWEEN 10 AND 30)
       OR (p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND NOT p_size < 45)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load(spark, sf_dir, "part")
    cond = (F.col("p_type").like("PROMO%") & F.col("p_size").between(10, 30)) | (
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") & ~(F.col("p_size") < 45)
    )
    return p.where(cond).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "filter_null_semantics",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NULL
       OR nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F'
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null injection via nullif + IS NULL + null-safe equality (<=>).

    The fixture tables contain no nulls (FIXTURES.md), so nulls are
    manufactured — mirroring how pg2ch maps absent/TOASTed values to
    ClickHouse `\\N` (R11).
    """
    o = catalog.load(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select("o_orderkey", status_np.alias("status_np")).where(
        F.col("status_np").isNull() | F.col("status_np").eqNullSafe(F.lit("F"))
    )


@register(
    "conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_tier,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_default,
           least(o_totalprice, 200000.0) AS capped,
           greatest(o_totalprice, 50000.0) AS floored
    FROM orders
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp >= 300000, "high").when(tp >= 100000, "mid").otherwise("low").alias("price_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_or_default"
        ),
        F.least(tp, F.lit(200000.0)).alias("capped"),
        F.greatest(tp, F.lit(50000.0)).alias("floored"),
    )
