"""TPC-H Q2/Q11/Q16/Q20 over a DERIVED partsupp (SURVEY §2.3 O).

The fixture set has no partsupp table — the one hole in the relational
surface every round has accepted so far. These four queries close it by
deriving partsupp deterministically from part × supplier with pure
integer arithmetic, computed identically (and cheaply) on both engines:

    for k in 0..3:                        # 4 suppliers per part
      ps_suppkey         = 1 + (p_partkey*7  + k*13) % |supplier|
      ps_availqty        = 1 + (p_partkey*4  + k*3 ) % 9999
      ps_supplycost_cents= 100 + (p_partkey*17 + k*29) % 99900

Costs live as integer CENTS end-to-end (sums, thresholds, minima are
exact bigint math — the Q9 decimal-exactness lesson); division by 100
happens only in the final projection through DECIMAL, so both engines
print identical numerics. Threshold comparisons that the spec writes as
`x > fraction * total` are restated integer-exactly
(`x * 10000 > total`).

The queries keep their TPC-H shapes, adapted to fixture columns
(p_brand for p_mfgr, s_acctbal < 0 for the complaints predicate,
NATION_7/EUROPE/STANDARD for the spec's constants).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

# Shared oracle prefix: the derived partsupp as a CTE.
PARTSUPP_CTE = """
WITH ns AS (SELECT count(*) AS n FROM supplier),
partsupp AS (
    SELECT p_partkey AS ps_partkey,
           CAST(1 + (p_partkey * 7 + r.k * 13) % ns.n AS BIGINT) AS ps_suppkey,
           CAST(1 + (p_partkey * 4 + r.k * 3) % 9999 AS BIGINT) AS ps_availqty,
           CAST(100 + (p_partkey * 17 + r.k * 29) % 99900 AS BIGINT)
               AS ps_supplycost_cents
    FROM part, range(0, 4) AS r(k), ns
)
"""


def derive_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side of the shared derivation: part × 4 (in-row
    explode, no shuffle) with the supplier count broadcast — at any
    scale this is a map-only expansion of the part dimension."""
    part = catalog.load(spark, sf_dir, "part").select("p_partkey")
    ns = (
        catalog.load(spark, sf_dir, "supplier")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("_ns"))
    )
    k = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k")
    return (
        part.crossJoin(F.broadcast(ns))
        .select("p_partkey", "_ns", k)
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (1 + (F.col("p_partkey") * 7 + F.col("k") * 13) % F.col("_ns"))
            .cast("bigint")
            .alias("ps_suppkey"),
            (1 + (F.col("p_partkey") * 4 + F.col("k") * 3) % 9999)
            .cast("bigint")
            .alias("ps_availqty"),
            (100 + (F.col("p_partkey") * 17 + F.col("k") * 29) % 99900)
            .cast("bigint")
            .alias("ps_supplycost_cents"),
        )
    )


def _cents_to_dec(col: F.Column) -> F.Column:
    """Exact cents → DECIMAL(18,2) money → DOUBLE for emission (the
    q9 convention: ≤15 significant digits, so the double is exact and
    the harness's float canonicalization sees identical values)."""
    return (col.cast("decimal(18,2)") / 100).cast("decimal(18,2)").cast("double")


@register(
    "query_tpch_q2",
    oracle=PARTSUPP_CTE
    + """
    , eligible AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost_cents,
               s_acctbal, s_name, n_name
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_brand,
           CAST(CAST(CAST(ps_supplycost_cents AS DECIMAL(18,2)) / 100
                AS DECIMAL(18,2)) AS DOUBLE) AS ps_supplycost
    FROM part JOIN eligible ON p_partkey = ps_partkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND ps_supplycost_cents = (
          SELECT min(e2.ps_supplycost_cents) FROM eligible e2
          WHERE e2.ps_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def query_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier: for STANDARD size-15 parts, the
    EUROPE supplier(s) at each part's minimum supply cost. The spec's
    correlated scalar-min subquery de-correlates to ONE per-part
    pre-aggregate over the eligible (region-filtered) partsupp, joined
    back on (part, min-cents) — the q17 shape. Supplier/nation/region
    dims broadcast; the top-100 is TakeOrderedAndProject. Cost minima
    compare as integer cents (exact)."""
    ps = derive_partsupp(spark, sf_dir)
    sup = catalog.load(spark, sf_dir, "supplier")
    nat = catalog.load(spark, sf_dir, "nation")
    reg = catalog.load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = catalog.load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    # Slice parts FIRST: the per-part min is unchanged for the parts
    # that survive, and the pre-aggregate shrinks to the slice — small
    # enough to broadcast the join-back (no sort-merge anywhere).
    sliced = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "ps_partkey",
            "ps_supplycost_cents",
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
        )
    )
    min_cost = sliced.groupBy(F.col("ps_partkey").alias("_mk")).agg(
        F.min("ps_supplycost_cents").alias("_min_cents")
    )
    return (
        sliced.join(
            F.broadcast(min_cost),
            (F.col("ps_partkey") == F.col("_mk"))
            & (F.col("ps_supplycost_cents") == F.col("_min_cents")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            _cents_to_dec(F.col("ps_supplycost_cents")).alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "query_tpch_q11",
    oracle=PARTSUPP_CTE
    + """
    , nat AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7'),
    vals AS (
        SELECT ps_partkey, sum(ps_supplycost_cents * ps_availqty) AS v_cents
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nat ON s_nationkey = n_nationkey
        GROUP BY ps_partkey
    ), tot AS (SELECT sum(v_cents) AS t_cents FROM vals)
    SELECT ps_partkey,
           CAST(CAST(CAST(v_cents AS DECIMAL(38,4)) / 100
                AS DECIMAL(18,2)) AS DOUBLE) AS value_
    FROM vals, tot
    WHERE v_cents * 10000 > t_cents
    ORDER BY value_ DESC, ps_partkey
    """,
)
def query_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: parts whose NATION_7 inventory value
    exceeds 0.01% of the nation's total. The scalar-total subquery is a
    1-row broadcast crossJoin (the q22 shape); the spec's fractional
    threshold is restated integer-exactly (v*10000 > total) so no
    float ever enters the comparison. Inventory values accumulate as
    bigint cents — exact at any scale — and the shuffle key is
    ps_partkey (uniform)."""
    ps = derive_partsupp(spark, sf_dir)
    sup = catalog.load(spark, sf_dir, "supplier")
    nat = catalog.load(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    )
    vals = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias(
                "v_cents"
            )
        )
    )
    tot = vals.groupBy().agg(F.sum("v_cents").alias("t_cents"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .where(F.col("v_cents") * 10000 > F.col("t_cents"))
        .select(
            "ps_partkey",
            (F.col("v_cents").cast("decimal(38,4)") / 100)
            .cast("decimal(18,2)")
            .cast("double")
            .alias("value_"),
        )
        .orderBy(F.col("value_").desc(), "ps_partkey")
    )


@register(
    "query_tpch_q16",
    oracle=PARTSUPP_CTE
    + """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def query_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship: distinct supplier counts
    per (brand, type, size) slice, excluding one brand/type and
    suppliers matching a predicate (s_acctbal < 0 stands in for the
    spec's complaints filter). The NOT IN is a broadcast LEFT ANTI
    join (null-safe here: s_suppkey is never null); count(DISTINCT)
    expands to the standard two-phase aggregate."""
    ps = derive_partsupp(spark, sf_dir)
    part = catalog.load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_sup = (
        catalog.load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_sup),
            ps.ps_suppkey == bad_sup.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "query_tpch_q20",
    oracle=PARTSUPP_CTE
    + """
    , qty AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1996-01-01'
        GROUP BY l_partkey, l_suppkey
    ), small_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ), surplus AS (
        SELECT DISTINCT ps_suppkey
        FROM partsupp
        JOIN small_parts ON ps_partkey = p_partkey
        JOIN qty ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE CAST(2 * ps_availqty AS DOUBLE) > q
    )
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN surplus ON s_suppkey = ps_suppkey
    WHERE n_name = 'NATION_7'
    ORDER BY s_name
    """,
)
def query_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion: NATION_7 suppliers whose
    available stock of some 'small%' part exceeds half of what they
    shipped of it in 1995. The spec's nested IN chain de-correlates to
    one (part, supplier) shipment pre-aggregate joined against
    partsupp, reduced to DISTINCT surplus suppliers — a semi-join
    cascade with the fact table aggregated BEFORE any join (the
    half-sum threshold compares as 2·availqty > qty: doubling the
    integer side instead of halving the double side keeps one side
    exact)."""
    ps = derive_partsupp(spark, sf_dir)
    li = catalog.load(spark, sf_dir, "lineitem")
    qty = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    small_parts = (
        catalog.load(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    surplus = (
        ps.join(F.broadcast(small_parts), ps.ps_partkey == F.col("p_partkey"))
        .join(
            qty,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where((2 * F.col("ps_availqty")).cast("double") > F.col("q"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = catalog.load(spark, sf_dir, "supplier")
    nat = catalog.load(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    )
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(surplus, F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
