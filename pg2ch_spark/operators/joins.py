"""Group C — joins (SURVEY §2.3 C).

pg2ch itself implements no joins (SURVEY §2.1) — it delegates them to
ClickHouse over the replicated tables. This module provides that
delegated surface Spark-first.

Scale notes (100 TB):
- Equi-joins are declared, not scheduled: Catalyst picks broadcast vs
  shuffled-hash vs sort-merge from stats, and AQE re-picks at runtime
  (plus skew-split). ``join_broadcast`` pins the dimension broadcast
  explicitly — the pattern for star-schema dims (region/nation/
  customer) that must never shuffle the fact table twice.
- ``join_theta_range`` keeps an equi conjunct (l_orderkey=o_orderkey)
  so the range predicate is a post-join filter on a key-partitioned
  join, never a cartesian product.
- ``join_asof`` uses the event id as the ordering axis and reduces via
  max/max_by aggregation rather than materializing per-pair rows. At
  100 TB this plan shuffles both sides once by (user_id) — the same
  partitioning an `applyInPandas` merge_asof variant would need, but
  staying fully JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


@register(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@register(
    "join_multiway_star",
    oracle="""
    SELECT r.r_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way star join, revenue per nation.

    The two tiny dims (region 5, nation 25) broadcast; the fact chain
    joins on keys. AQE coalesces the post-agg partitions.
    """
    r = catalog.load(spark, sf_dir, "region")
    n = catalog.load(spark, sf_dir, "nation")
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT custkey, c_acctbal, n_orders
    FROM (SELECT c_custkey AS custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0) a
    FULL JOIN (SELECT o_custkey AS custkey, count(*) AS n_orders
               FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey) b
    USING (custkey)
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer on deliberately partial key sets (evens vs multiples of 3)."""
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    a = c.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("custkey"), "c_acctbal"
    )
    b = (
        o.where(F.col("o_custkey") % 3 == 0)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # join on the column name so the USING-style coalesced key matches DuckDB
    return a.join(b, on="custkey", how="full")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order. (Every customer has *some* order in
    the fixtures, so the unrestricted NOT EXISTS would be degenerate —
    the priority filter makes the anti-join observable: ~200 rows at
    sf0.01.)"""
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = catalog.load(spark, sf_dir, "region")
    n = catalog.load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_broadcast",
    oracle="""
    SELECT c.c_custkey, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the 25-row dim — value-identical to the plain
    join; exists to pin the plan (BroadcastHashJoin, no shuffle of the
    probe side). Verified in tests/test_plans.py."""
    c = catalog.load(spark, sf_dir, "customer")
    n = catalog.load(spark, sf_dir, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select("c_custkey", "n_name")


@register(
    "join_theta_range",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT) AS days_after
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate + INTERVAL 365 DAY
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 730 DAY
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load(spark, sf_dir, "lineitem")
    o = catalog.load(spark, sf_dir, "orders")
    lo = F.col("o_orderdate") + F.expr("INTERVAL 365 DAY")
    hi = F.col("o_orderdate") + F.expr("INTERVAL 730 DAY")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") <= hi),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("int").alias("days_after"),
        )
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           max(v.event_id)                 AS prior_view_id,
           -- struct-wrap pins ROW-exact semantics: bare arg_max skips
           -- a NULL payload at the max id (returning an older view's
           -- value) where Spark's max_by returns the max-id row's NULL;
           -- a struct containing a NULL field is itself non-NULL, so
           -- neither engine skips and both read the same row
           round(arg_max({'v': v.value}, v.event_id).v, 2) AS prior_view_value
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.event_id < p.event_id
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: per purchase, the most recent prior view of the user.

    The ordering axis is event_id (monotone, unique — determinism rule
    D1; also dodges the ns-vs-µs timestamp hazard D3). Implemented as
    ONE ordered window over the unioned event stream, not an inequality
    join: the per-user purchase×view pair stream an inequality join
    feeds its aggregate is quadratic in per-user activity — fine when
    activity is uniform (the 1000× probe read 94.5× on the join form),
    but a single power user with 1M events is a 10¹²-pair straggler.
    Sorting each user's stream once and carrying the last-seen view
    forward costs one sort-shuffle total and is linear in EVERY
    distribution. The struct-wrap keeps a NULL-valued view from being
    skipped by ignorenulls — the struct is non-null whenever the row is
    a view, so the window reads the same row max_by/arg_max would (see
    the oracle's comment).
    """
    ev = catalog.load(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == "view",
            F.struct(F.col("event_id").alias("vid"), F.col("value").alias("val")),
        ).alias("_v"),
    )
    prior = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "event_type",
            F.last("_v", ignorenulls=True).over(prior).alias("_pv"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("_pv.vid").alias("prior_view_id"),
            F.round("_pv.val", 2).alias("prior_view_value"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id AS view_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS t, value
        FROM events WHERE event_type = 'view'
    )
    SELECT p.purchase_id, p.user_id,
           min(v.view_id)                        AS next_view_id,
           CAST(min(v.t - p.t) AS BIGINT)        AS gap_s
    FROM p
    LEFT JOIN v ON v.user_id = p.user_id
               AND v.t >= p.t AND v.t <= p.t + 3600
               AND v.view_id > p.purchase_id
    GROUP BY p.purchase_id, p.user_id
    ORDER BY p.purchase_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (pandas ``merge_asof``'s
    direction='forward', tolerance=1h — the other half of the asof
    surface `join_asof` covers backward/unbounded): per purchase, the
    first subsequent view within one hour, NULL if none (tolerance
    expired). Same single-shuffle shape as the backward variant: the
    inequality conjuncts ride the user_id equi-join and the min
    aggregation reduces matches without materializing per-pair rows —
    the tolerance bound is ALSO the state-eviction bound a streaming
    deployment of the same join would use as its watermark."""
    ev = catalog.load(spark, sf_dir, "events")
    t = catalog.ts_epoch_s(ev)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", t.alias("pt")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        t.alias("vt"),
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("vt") >= F.col("pt"))
            & (F.col("vt") <= F.col("pt") + 3600)
            & (F.col("view_id") > F.col("purchase_id")),
            "left",
        )
        .groupBy("purchase_id", "user_id")
        .agg(
            F.min("view_id").alias("next_view_id"),
            F.min(F.col("vt") - F.col("pt")).cast("bigint").alias("gap_s"),
        )
        .orderBy("purchase_id")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH pairs AS (
        SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS vid,
               abs(v.event_id - p.event_id) AS d
        FROM events p JOIN events v
          ON v.user_id = p.user_id AND v.event_type = 'view'
        WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, user_id, vid AS nearest_view_id,
           CAST(d AS BIGINT) AS dist
    FROM pairs
    QUALIFY row_number() OVER (PARTITION BY purchase_id ORDER BY d, vid) = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof`` direction='nearest' —
    completing the backward / forward+tolerance / nearest direction
    surface): per purchase, the view minimizing |Δevent_id| in either
    direction, equidistant ties resolved to the earlier (backward)
    view. Purchases whose user has no views are out of scope by the
    inner-join contract (the backward variant covers the LEFT form).

    The nearest view in event_id space is by definition either the
    LAST view before the purchase or the FIRST view after it in the
    per-user id-ordered stream, so one sort-shuffle with a backward
    and a forward ignorenulls window replaces the user equi-join —
    the join's per-user purchase×view pair stream is quadratic in
    per-user activity (9.1 s at sf0.1 on the join form; a power user
    is a straggler), the windowed form is linear in every
    distribution. Equidistant ties resolve to the earlier (backward)
    view via <=."""
    ev = catalog.load(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("_vid"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev_v = F.last("_vid", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_v = F.first("_vid", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    picked = (
        tagged.select(
            "event_id",
            "user_id",
            "event_type",
            prev_v.alias("_pv"),
            next_v.alias("_nv"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(F.col("_nv").isNull(), F.col("_pv"))
            .when(F.col("_pv").isNull(), F.col("_nv"))
            .when(
                F.col("event_id") - F.col("_pv") <= F.col("_nv") - F.col("event_id"),
                F.col("_pv"),
            )
            .otherwise(F.col("_nv"))
            .alias("nearest_view_id"),
        )
        .where(F.col("nearest_view_id").isNotNull())  # inner-join contract
    )
    return picked.select(
        "purchase_id",
        "user_id",
        "nearest_view_id",
        F.abs(F.col("nearest_view_id") - F.col("purchase_id"))
        .cast("bigint")
        .alias("dist"),
    )
