"""Group D — aggregations (SURVEY §2.3 D).

pg2ch delegates aggregation to ClickHouse's MergeTree engines; here the
same surface is Catalyst hash aggregation — always partial (map-side)
+ final, so a 100 TB groupBy ships pre-combined partials, not rows.

Determinism (SURVEY §2.5 D2, refined after measuring the fixtures):
money columns are 2dp-exact doubles, so sums of them round safely at
2dp; price×discount products are 4dp-exact → round at 4dp; true
continuous stats (avg/stddev/corr) round at 6dp where the cross-engine
double error (~1e-12) is far below the rounding step.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


@register(
    "agg_groupby_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)       AS sum_qty,
           round(sum(l_extendedprice), 2)  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 6)       AS avg_qty,
           round(avg(l_extendedprice), 6)  AS avg_price,
           round(avg(l_discount), 6)       AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical partial+final hash agg."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 4).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@register("agg_approx_distinct")  # rows-only: HLL result is algorithm-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users — the 100 TB path where exact countDistinct
    (which double-shuffles) is replaced by a mergeable sketch."""
    ev = catalog.load(spark, sf_dir, "events")
    return ev.agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = catalog.load(spark, sf_dir, "region")
    n = catalog.load(spark, sf_dir, "nation")
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT event_type, CAST(isodow(ts) AS INT) AS iso_dow, count(*) AS n
    FROM events
    GROUP BY CUBE (event_type, CAST(isodow(ts) AS INT))
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count by CUBE(event_type, ISO weekday) — D4: ISO day numbering only
    (Spark weekday() is 0=Mon, DuckDB isodow is 1=Mon)."""
    ev = catalog.load(spark, sf_dir, "events")
    with_dow = ev.select(
        "event_type", (F.weekday("ts") + F.lit(1)).cast("int").alias("iso_dow")
    )
    return with_dow.cube("event_type", "iso_dow").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, o_orderstatus,
           round(sum(o_totalprice), 2) AS revenue, count(*) AS n
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    catalog.load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderstatus,
               round(sum(o_totalprice), 2) AS revenue, count(*) AS n
        FROM v_customer JOIN v_orders ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT c_mktsegment, round(avg(c_acctbal), 6) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    HAVING avg(c_acctbal) > 4400
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.avg("c_acctbal").alias("_raw_avg"))
        .where(F.col("_raw_avg") > 4400)
        .select("c_mktsegment", F.round("_raw_avg", 6).alias("avg_bal"))
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT user_id,
           CAST(round(sum(CAST(value AS DECIMAL(18,6)))
                          FILTER (WHERE event_type = 'purchase'), 2)
                AS DOUBLE) AS purchase_total,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregate as conditional sum — stays a single
    map-side-combinable hash agg (no second pass). Decimal-mediated sum
    (order-insensitive — see cdc_summing_final)."""
    ev = catalog.load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,6)"),
                )
            ),
            2,
        )
        .cast("double")
        .alias("purchase_total"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT user_id, string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS types
    FROM events GROUP BY user_id
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted distinct set as a joined string (D5: stringify arrays)."""
    ev = catalog.load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), "|").alias("types")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6)    AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )


@register(
    "agg_median_exact",
    oracle="""
    SELECT o_orderstatus, round(median(o_totalprice), 4) AS median_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) median, not approx_percentile — the midpoint
    of two 2dp values is 3dp-exact, so rounding at 4dp is unambiguous."""
    o = catalog.load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price")
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a pathologically skewed key.

    `events.event_type` has 5 values for the whole table — the shape
    where a naive groupBy sends ~1/5 of 100 TB through 5 reducers.
    Phase 1 salts the key with `pmod(event_id, 16)` (deterministic, no
    rand()) and aggregates (key, salt) — 80 evenly-sized partials;
    phase 2 folds the partials. Value-identical to the plain GROUP BY
    (the oracle), so the correctness check also proves the rewrite is
    semantics-preserving. AQE's skew-join splitting handles the join
    version of this automatically; salting is the aggregation-side
    pattern you apply yourself.
    """
    ev = catalog.load(spark, sf_dir, "events")
    partial = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16))).groupBy(
        "event_type", "_salt"
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        # decimal partials: the salted rewrite re-orders the summation,
        # which is only value-identical to the plain GROUP BY oracle if
        # addition is associative — exact decimals make it so
        F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.round(F.sum("pv"), 2).cast("double").alias("total"),
    )
