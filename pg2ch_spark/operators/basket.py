"""Market-basket analysis over the relational side (orders × parts) —
co-occurrence lift between part brands inside an order, the classic
association-rule support/lift readout.

Scale note: pair enumeration is IN-ROW from per-order brand sets (the
joinless `events_segment_overlap` shape) — baskets are small (an order
has ≤ 7 lineitems), so the ≤ C(7,2) pair explode is a constant factor,
never a basket self-join of the fact table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

_MB_MIN_SUPPORT = 5  # pair must appear in >= 5 orders
_MB_TOPK = 30


@register(
    "orders_market_basket",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tot AS (
        SELECT count(DISTINCT okey) AS n_orders FROM ob
    ), singles AS (
        SELECT brand, count(*) AS n FROM ob GROUP BY brand
    ), pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
        FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * t.n_orders / sa.n / sb.n, 4) AS lift
    FROM pairs
    JOIN singles sa ON sa.brand = brand_a
    JOIN singles sb ON sb.brand = brand_b
    CROSS JOIN tot t
    WHERE n_ab >= {_MB_MIN_SUPPORT}
    QUALIFY row_number() OVER (
        ORDER BY round(CAST(n_ab AS DOUBLE) * t.n_orders / sa.n / sb.n, 4) DESC,
                 brand_a, brand_b) <= {_MB_TOPK}
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_MB_TOPK} co-purchased brand pairs by lift (support ≥
    {_MB_MIN_SUPPORT} orders): lift = P(a,b) / (P(a)·P(b)) over order
    baskets — the association-rule readout, run on the TPC-H side
    (lineitem ⋈ part) rather than the event stream.

    Joinless pair generation: one groupBy(orderkey) collects each
    order's distinct brand set (baskets are ≤ 7 lineitems, so the
    in-row pair explode is ≤ C(7,2) — the `events_segment_overlap`
    shape), pair counts partial-aggregate map-side, and the two
    single-brand marginals broadcast back onto the ≤ \\|brands\\|² pair
    table. The lift division chain is written left-associative
    identically on both engines; the global top-k is
    TakeOrderedAndProject on the rounded lift with a full tie-break.
    """
    li = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = catalog.load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    baskets = ob.groupBy("okey").agg(F.array_sort(F.collect_set("brand")).alias("bs"))
    pairs = (
        baskets.select(F.explode("bs").alias("brand_a"), "bs")
        .select("brand_a", F.explode("bs").alias("brand_b"))
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _MB_MIN_SUPPORT)
    )
    singles = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("n"))
    tot = ob.agg(F.countDistinct("okey").alias("n_orders"))
    sa = singles.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    lift = F.round(
        F.col("n_ab").cast("double") * F.col("n_orders") / F.col("n_a") / F.col("n_b"),
        4,
    )
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select("brand_a", "brand_b", "n_ab", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(_MB_TOPK)
    )


# ---------------------------------------------------------------------------
# Pareto / ABC classification — cumulative revenue share tiers.

_ABC_A = 0.70
_ABC_B = 0.90


@register(
    "orders_pareto_abc",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey AS pk,
               sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS r
        FROM lineitem GROUP BY l_partkey
    ), tot AS (
        SELECT sum(r) AS t FROM rev
    ), ranked AS (
        SELECT pk, r,
               sum(r) OVER (ORDER BY r DESC, pk
                            ROWS UNBOUNDED PRECEDING) AS cum_r
        FROM rev
    ), classed AS (
        SELECT pk, r,
               CASE WHEN CAST(cum_r AS DOUBLE) / CAST(t.t AS DOUBLE) <= {_ABC_A}
                        THEN 'A'
                    WHEN CAST(cum_r AS DOUBLE) / CAST(t.t AS DOUBLE) <= {_ABC_B}
                        THEN 'B'
                    ELSE 'C' END AS abc
        FROM ranked CROSS JOIN tot t
    )
    SELECT abc, count(*) AS n_parts,
           CAST(round(sum(r), 2) AS DOUBLE) AS revenue,
           round(CAST(sum(r) AS DOUBLE) /
                 (SELECT CAST(t AS DOUBLE) FROM tot), 4) AS share
    FROM classed GROUP BY abc ORDER BY abc
    """,
)
def orders_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts tiered by cumulative
    revenue share (A ≤ {_ABC_A:.0%}, B ≤ {_ABC_B:.0%}, C the tail) —
    the 80/20 readout behind assortment and caching decisions.

    Exactness discipline for a CUMULATIVE float statistic: per-part
    revenue sums and the running cumulative are EXACT DECIMAL (window
    sum of decimals — no float association order anywhere), and the
    share each classification compares is ONE IEEE division of two
    exact decimals cast to double — identical in both engines, so even
    parts sitting exactly on a tier boundary classify identically. The
    window runs over the PART-level aggregate (orders of magnitude
    below lineitem); at catalog scale the distributed prefix-sum of
    `pipeline_pack_sequences` slots in for the single window.
    """
    li = catalog.load(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("r")
    )
    tot = rev.agg(F.sum("r").alias("t"))
    w = Window.orderBy(F.col("r").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.withColumn("cum_r", F.sum("r").over(w))
    share = F.col("cum_r").cast("double") / F.col("t").cast("double")
    classed = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "abc",
        F.when(share <= _ABC_A, "A").when(share <= _ABC_B, "B").otherwise("C"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("r"), 2).cast("double").alias("revenue"),
            F.round(
                F.sum("r").cast("double") / F.first(F.col("t").cast("double")), 4
            ).alias("share"),
        )
        .orderBy("abc")
    )


# ---------------------------------------------------------------------------
# Shipping SLA — fill-rate and lateness quantiles per order priority.

_SLA_DAYS = 90


@register(
    "orders_fill_rate_sla",
    oracle=f"""
    WITH lines AS (
        SELECT o.o_orderpriority AS priority,
               CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                   AS days_to_ship
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           count(*) AS n_lines,
           round(count(*) FILTER (WHERE days_to_ship <= {_SLA_DAYS})
                 / CAST(count(*) AS DOUBLE), 4) AS sla_hit_rate,
           round(quantile_cont(days_to_ship, 0.5), 4) AS p50_days,
           round(quantile_cont(days_to_ship, 0.9), 4) AS p90_days
    FROM lines GROUP BY priority ORDER BY priority
    """,
)
def orders_fill_rate_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping SLA per order priority: the share of lineitems shipped
    within {_SLA_DAYS} days of their order date plus p50/p90
    days-to-ship — the fulfillment dashboard on the relational side
    (the `events_time_to_convert` shape for orders).

    days-to-ship is an INTEGER date difference with a bounded range
    (≤ ~4 months of distinct values), so the exact interpolated
    quantiles come off a VALUE-EXACT histogram instead of Spark's
    `percentile` buffering every row per group — at 1000× that buffer
    is ~1 GB of longs per priority reducer, while the histogram is 5 ×
    ~130 counted rows and the quantile lookup reads cumulative counts.
    The interpolation is the same lower + frac·(upper−lower) both
    engines compute from pos = p·(n−1), on the same IEEE doubles, so
    the 4dp contract is unchanged. One fact join (orders side
    broadcast-eligible per priority slice would skew — the plain
    equi-join on orderkey is the right plan), one map-side-partial
    histogram agg, then constant-size work.
    """
    li = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("days_to_ship"),
    )
    hist = lines.groupBy("priority", "days_to_ship").agg(F.count(F.lit(1)).alias("c"))
    tot = hist.groupBy("priority").agg(
        F.sum("c").alias("n_lines"),
        F.coalesce(
            F.sum(F.when(F.col("days_to_ship") <= _SLA_DAYS, F.col("c"))), F.lit(0)
        ).alias("hit"),
    )
    wcum = Window.partitionBy("priority").orderBy("days_to_ship")
    h = hist.withColumn("cum", F.sum("c").over(wcum)).join(F.broadcast(tot), "priority")

    # The value covering 0-indexed sorted position k is the histogram
    # row whose cumulative range [cum - c, cum) contains k.
    def value_at(k):
        return F.max(
            F.when(
                (F.col("cum") - F.col("c") <= k) & (k < F.col("cum")),
                F.col("days_to_ship"),
            )
        )

    # One formula for the 0-indexed interpolation position — used both
    # for the lookup indices (pre-agg) and the fraction (post-agg), so
    # the convention cannot silently mix.
    def qpos(p):
        return F.lit(p) * (F.col("n_lines").cast("double") - 1)

    per = h.groupBy("priority").agg(
        F.first("n_lines").alias("n_lines"),
        F.first("hit").alias("hit"),
        *[
            v.alias(nm)
            for p, tag in ((0.5, "p50"), (0.9, "p90"))
            for nm, v in (
                (f"{tag}_lo", value_at(F.floor(qpos(p)))),
                (f"{tag}_hi", value_at(F.floor(qpos(p)) + 1)),
            )
        ],
    )
    qcols = []
    for p, tag in ((0.5, "p50"), (0.9, "p90")):
        pp = qpos(p)
        frac = pp - F.floor(pp)
        lo = F.col(f"{tag}_lo").cast("double")
        hi_ = F.coalesce(F.col(f"{tag}_hi"), F.col(f"{tag}_lo")).cast("double")
        qcols.append(F.round(lo + frac * (hi_ - lo), 4).alias(f"{tag}_days"))
    return per.select(
        "priority",
        "n_lines",
        F.round(F.col("hit") / F.col("n_lines").cast("double"), 4).alias("sla_hit_rate"),
        *qcols,
    ).orderBy("priority")
