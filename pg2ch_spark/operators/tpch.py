"""TPC-H-adapted composite queries (round 3).

The analytics surface pg2ch delegates to ClickHouse (SURVEY §2.1: the
reference replicates INTO an OLAP store precisely so these shapes can
run there) — expressed over the driver's TPC-H-ish star schema.
Adaptations per FIXTURES.md: no partsupp table (Q2/Q11/Q16/Q20 out of
scope; Q9 models supply cost from p_retailprice), no l_commitdate/
l_receiptdate (lateness = l_shipdate vs o_orderdate + grace), no
c_phone/o_comment (Q13/Q22 use priority / nation instead), p_type is a
single word and p_container is absent (Q14/Q19 use equality / p_size
ranges).

Every query keeps the TPC-H plan *shape* the spec intends —
correlated EXISTS / NOT EXISTS, scalar correlated subqueries, left
outer + count distributions, OR-of-ANDs pushdown — but expressed the
way Spark wants them: de-correlated into semi/anti joins and
pre-aggregates, dimension filters pushed below joins, tiny sides
broadcast, total orders for deterministic top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS(lineitem shipped >60d after order)


@register(
    "query_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def query_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (priority checking), lateness adapted to shipdate:
    orders in one quarter having ANY line shipped >60 days after the
    order date. The correlated EXISTS de-correlates to a LEFT SEMI
    join on the order key with the lateness predicate in the join
    condition — one shuffle on l_orderkey, no duplicate counting, and
    the quarter filter prunes the orders scan before the join."""
    o = catalog.load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = catalog.load(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join, customer and supplier in the
# same nation, one region, one year.


@register(
    "query_tpch_q5",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def query_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume). Join order matters at scale:
    the two facts join first on their natural key (one shuffle each),
    then supplier/nation/region — all broadcast-size — attach without
    further shuffles; the same-nation requirement rides the supplier
    join as an extra conjunct instead of a post-filter, so mismatched
    rows never survive the build side."""
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = catalog.load(spark, sf_dir, "lineitem")
    s = catalog.load(spark, sf_dir, "supplier")
    n = catalog.load(spark, sf_dir, "nation")
    r = catalog.load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure filter-aggregate, fully pushed down.


@register(
    "query_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def query_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue): filter + global sum, zero joins.
    All four predicates reach the parquet scan (min/max row-group
    pruning on shipdate at scale); the aggregate is a map-side partial
    into a 1-row final — the cheapest possible shuffle."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.03, 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and ship year.


@register(
    "query_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def query_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): trade volume between two nations in
    both directions per ship year. The nation pair predicate cannot be
    pushed below the fact-fact join (it spans both sides), but each
    single-nation membership CAN: supplier and customer are pre-joined
    to their (broadcast) nation rows filtered to the two names, so the
    facts shrink before the big l⋈o shuffle."""
    two = ["NATION_1", "NATION_2"]
    n = catalog.load(spark, sf_dir, "nation").where(F.col("n_name").isin(two))
    s = (
        catalog.load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        catalog.load(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = catalog.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = catalog.load(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region for one part type.


@register(
    "query_tpch_q8",
    oracle="""
    WITH nations AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
    )
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM nations GROUP BY o_year ORDER BY o_year
    """,
)
def query_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (market share): one nation's share of a region's PROMO
    revenue per order year. Part/supplier/nation/region are broadcast
    dims; the only repartition exchanges are the two fact joins. The
    share is a conditional-sum ratio inside ONE aggregation — not a
    join of two aggregates."""
    p = catalog.load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = catalog.load(spark, sf_dir, "lineitem")
    o = catalog.load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = catalog.load(spark, sf_dir, "customer")
    n1 = catalog.load(spark, sf_dir, "nation")
    r = catalog.load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = catalog.load(spark, sf_dir, "supplier")
    n2 = catalog.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", _rev()).otherwise(F.lit(0.0)))
                / F.sum(_rev()),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q10 — returned item reporting: top-20 customers by returned revenue.


@register(
    "query_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def query_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): customers who returned the most in
    one quarter. Both fact filters (quarter, returnflag) are pushed to
    their scans; nation broadcasts; global top-20 by revenue is
    TakeOrderedAndProject over the grouped partials with c_custkey as
    the total-order tie-break."""
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = catalog.load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = catalog.load(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping priority classes (adapted: returnflag stands in for
# the absent l_shipmode; lateness = shipped >=90d after order date).


@register(
    "query_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def query_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and priority): late lines (shipped
    ≥90 days after ordering) in one year, split into high/low priority
    counts per class. Conditional counts in one aggregation — the
    year filter prunes the lineitem scan; the cross-table lateness
    predicate rides the join."""
    o = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution via LEFT OUTER + double agg.


@register(
    "query_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def query_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    how many (non-urgent) orders — customers with none count at 0,
    which is why the join MUST be left outer with the priority filter
    in the join condition (a WHERE would drop the no-order rows).
    First agg counts per customer (shuffle on custkey), second is a
    near-free recount of 1.5k-at-sf0.01 rows."""
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect: conditional revenue share in one month.


@register(
    "query_tpch_q14",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def query_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue
    from PROMO parts. Part is broadcast (20k rows even at sf0.1 — and
    at 100 TB part stays dimension-sized); the month filter prunes the
    lineitem scan; one conditional-sum aggregation, single-row out."""
    li = catalog.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = catalog.load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0)))
                / F.sum(_rev()),
                4,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: scalar correlated subquery
# de-correlated into a per-part pre-aggregate.


@register(
    "query_tpch_q17",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def query_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity orders): revenue from lines whose
    quantity is under 20% of their part's average. The scalar
    correlated subquery de-correlates into ONE groupBy over lineitem
    (map-side partials on l_partkey) whose tiny result joins back by
    part key — the naive plan re-scans lineitem per outer row. The
    brand filter shrinks part to broadcast size first."""
    li = catalog.load(spark, sf_dir, "lineitem")
    p = catalog.load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    # Per-part thresholds only for the brand's parts: semi-filter first
    # so the pre-aggregate shuffles the brand's ~4% of lineitem, not
    # the whole fact.
    li_brand = li.join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    ).drop("p_partkey")
    thresh = li_brand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li_brand.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue, OR-of-ANDs (p_size stands in for container).


@register(
    "query_tpch_q19",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def query_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three brand/size/quantity
    clauses OR'd together. The full disjunction references both
    tables so it can only run post-join — but its single-table
    projections CAN pre-filter: part shrinks to the three brand+size
    clauses (broadcast), lineitem to the quantity hull [1,30]. The
    post-join OR then only arbitrates the cross terms."""
    li = catalog.load(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    p = catalog.load(spark, sf_dir, "part").where(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50))
    )
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(clause)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS,
# adapted to shipdate), de-correlated into per-order supplier ranking.


@register(
    "query_tpch_q21",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_1'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def query_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), lateness adapted
    to shipdate: in finished multi-supplier orders, count each
    supplier's lines that shipped no earlier than every OTHER
    supplier's line. The correlated EXISTS + NOT EXISTS pair would
    cost two extra fact self-joins; instead ONE window pass per order
    computes (a) the number of distinct suppliers, (b) the two top
    per-supplier max shipdates — from which "max shipdate among other
    suppliers" is t1 (if another supplier attains it) or t2 (if only
    this one does). A line qualifies iff n_supp >= 2 and its shipdate
    >= that other-max. Same answer, one shuffle on l_orderkey."""
    li = catalog.load(spark, sf_dir, "lineitem")
    o = catalog.load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    n = catalog.load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    s = catalog.load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )

    # Per (order, supplier): this supplier's max shipdate in the order.
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    w = Window.partitionBy("l_orderkey")
    ranked = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("t1", F.max("s_max").over(w))
        # second-highest per-supplier max: max of s_max over rows that
        # are not the (single) argmax — expressed as the max of s_max
        # where s_max < t1, or t1 again when the top is tied.
        .withColumn(
            "top_cnt", F.sum(F.when(F.col("s_max") == F.col("t1"), 1).otherwise(0)).over(w)
        )
        .withColumn(
            "t2", F.max(F.when(F.col("s_max") < F.col("t1"), F.col("s_max"))).over(w)
        )
        .withColumn(
            "other_max",
            F.when(F.col("top_cnt") >= 2, F.col("t1")).otherwise(
                F.when(F.col("s_max") == F.col("t1"), F.col("t2")).otherwise(F.col("t1"))
            ),
        )
        .where(F.col("n_supp") >= 2)
        .select(
            F.col("l_orderkey").alias("q_orderkey"),
            F.col("l_suppkey").alias("q_suppkey"),
            "other_max",
        )
    )
    qualifying = li.join(
        ranked,
        (F.col("l_orderkey") == F.col("q_orderkey"))
        & (F.col("l_suppkey") == F.col("q_suppkey"))
        & (F.col("l_shipdate") >= F.col("other_max")),
    ).select(F.col("l_orderkey").alias("lo"), F.col("l_suppkey"))
    return (
        qualifying.join(o, F.col("lo") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: rich customers with no orders
# (scalar subquery + anti join; nation stands in for phone cntrycode).


@register(
    "query_tpch_q22",
    oracle="""
    SELECT n.n_name AS cntrycode, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def query_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers who never ordered, grouped by nation (the fixture has no
    c_phone, so nation plays cntrycode). The scalar subquery is a
    1-row aggregate crossJoin-broadcast onto customer; the NOT EXISTS
    is a LEFT ANTI join on custkey — both the plans Spark's own
    de-correlation would pick, stated explicitly."""
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    n = catalog.load(spark, sf_dir, "nation")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("cut"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("cut"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s): aggregate view + scalar-max subquery.


@register(
    "query_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def query_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with the maximum
    quarterly revenue — the classic aggregate-view + scalar-max-
    subquery shape. The revenue view is ONE pre-aggregate over the
    pruned lineitem scan; rounding to cents happens INSIDE the view
    (both engines), so the max-equality predicate compares identical
    rounded values and float sum-order noise cannot split the answer.
    The 1-row max broadcasts back onto the view — the view is never
    recomputed (Spark would otherwise expand the subquery into a
    second full aggregate)."""
    li = catalog.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = catalog.load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year (adapted: no partsupp, so
# supply cost is modeled as a stated fraction of the part's retail
# price — the join/agg shape is the point, not the cost model).

_Q9_COST_FRAC = 0.6


@register(
    "query_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           -- exact decimal aggregation: the inputs sit on a 2-4dp grid,
           -- so group sums genuinely land ON half-cent boundaries and
           -- float noise decides round(…,2)'s side per engine. Casting
           -- each addend to DECIMAL(18,4) (never near a 4dp midpoint —
           -- fp noise is 1e-10, midpoint distance 5e-5) makes the sum
           -- exact and identical in both engines; ≤15 significant
           -- digits, so the final DOUBLE is exact too.
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - {_Q9_COST_FRAC} * p.p_retailprice * l.l_quantity
                     AS DECIMAL(18, 4))) AS DOUBLE)
               AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%a%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def query_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), supply cost adapted to a stated
    fraction of p_retailprice (no partsupp table in the fixture):
    profit per supplier nation per order year over parts matching a
    name pattern. Part (LIKE-filtered), supplier and nation broadcast;
    the only repartition shuffle is lineitem⋈orders; profit is
    computed in-row before the aggregate so the shuffle carries one
    double per group per partition."""
    p = catalog.load(spark, sf_dir, "part").where(F.col("p_name").like("%a%"))
    li = catalog.load(spark, sf_dir, "lineitem")
    s = catalog.load(spark, sf_dir, "supplier")
    o = catalog.load(spark, sf_dir, "orders")
    n = catalog.load(spark, sf_dir, "nation")
    profit = (
        _rev() - F.lit(_Q9_COST_FRAC) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )
