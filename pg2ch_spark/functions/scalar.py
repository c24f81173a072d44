"""Group H — scalar function surface (SURVEY §2.3 H).

pg2ch parity: R11 — its only "functions" are type-cast/encode when
shaping PG values into ClickHouse literals (`pkg/utils/chutils`,
`pkg/utils/pgutils`). The analytics function library it delegates to
ClickHouse is provided here via built-in ``pyspark.sql.functions`` —
all JVM-side, whole-stage-codegen'd; zero Python in the row path.

Cross-engine hazards handled (SURVEY §2.5):
- D4: ISO weekday only (Spark weekday()+1 == DuckDB isodow).
- D3: epoch emitted as floor-seconds BIGINT in both engines.
- ceil/floor return BIGINT in Spark but DOUBLE in DuckDB → cast.
- libm (ln/exp) differs by ≤1 ulp across engines → round 6dp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                          AS up,
           lower(p_brand)                         AS lo,
           substring(p_name, 1, 10)               AS sub10,
           trim(concat('  ', p_name, '  '))       AS trimmed,
           lpad(p_brand, 12, '*')                 AS padded,
           replace(p_name, ' ', '_')              AS underscored,
           split_part(p_name, ' ', 1)             AS first_tok,
           CAST(length(p_name) AS INT)            AS name_len,
           regexp_extract(p_name, '([a-z]+)', 1)  AS first_word,
           concat(p_brand, ':', p_type)           AS brand_type
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 10).alias("sub10"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("underscored"),
        F.element_at(F.split("p_name", " "), 1).alias("first_tok"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(year(o_orderdate)  AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.year(d).cast("int").alias("y"),
        F.month(d).cast("int").alias("m"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("int").alias("days_since"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        # parquet ms timestamps read as TIMESTAMP_NTZ in Spark 4; NTZ has no
        # direct long cast — route through TIMESTAMP (identity under UTC)
        d.cast("timestamp").cast("long").alias("epoch_s"),
        (F.weekday(d) + F.lit(1)).cast("int").alias("iso_dow"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(-l_extendedprice), 2)             AS abs_price,
           CAST(ceil(l_discount * 100)  AS BIGINT)     AS ceil_disc_pct,
           CAST(floor(l_tax * 100)      AS BIGINT)     AS floor_tax_pct,
           round(power(l_quantity, 2), 2)              AS qty_sq,
           l_orderkey % 7                              AS mod7,
           CAST(sign(l_discount - 0.05) AS INT)        AS sgn,
           round(ln(l_extendedprice), 6)               AS ln_price,
           round(exp(l_discount), 6)                   AS exp_disc
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(-F.col("l_extendedprice")), 2).alias("abs_price"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("ceil_disc_pct"),
        F.floor(F.col("l_tax") * 100).cast("bigint").alias("floor_tax_pct"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sgn"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)    AS max_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events payload (`props` — the analog of
    pg2ch passing PG jsonb through as ClickHouse String, SURVEY §1.2)."""
    ev = catalog.load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "fn_variant_shred",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_eid,
           round(sum(value), 2) AS sum_v,
           round(sum(value * 2), 2) AS sum_v2,
           CAST(count(*) AS BIGINT) AS n_absent_null
    FROM events GROUP BY event_type
    """,
)
def fn_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4 VariantType): build a
    nested JSON document per event, `parse_json` it into a variant,
    then SHRED typed fields back out with `variant_get` /
    `try_variant_get` — the modern replacement for string-JSON
    `get_json_object` (`fn_json`): the variant is a parsed binary
    encoding, so repeated path extraction skips re-tokenizing the
    text, which at 100 TB is the difference between one parse and one
    parse PER extracted column. Everything checked comes through the
    variant: the grouping key itself ($.m.t), a bigint at the top
    level, a double inside a nested object, an ARRAY ELEMENT path
    ($.m.arr[1]), and absent-path semantics (try_variant_get of a
    missing key must be NULL on every row — counted and hash-gated).
    The oracle computes the same aggregates straight from the base
    columns, so any shredding loss (type coercion, path miss, array
    index off-by-one) breaks the hash."""
    ev = catalog.load(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id"),
            F.struct(
                F.col("event_type").alias("t"),
                F.col("value").alias("v"),
                F.array(F.col("value"), F.col("value") * 2).alias("arr"),
            ).alias("m"),
        )
    )
    v = ev.select(F.parse_json(doc).alias("v"))
    shred = v.select(
        F.expr("variant_get(v, '$.m.t', 'string')").alias("event_type"),
        F.expr("variant_get(v, '$.event_id', 'bigint')").alias("eid"),
        F.expr("variant_get(v, '$.m.v', 'double')").alias("val"),
        F.expr("variant_get(v, '$.m.arr[1]', 'double')").alias("val2"),
        F.expr("try_variant_get(v, '$.m.absent', 'int')").alias("absent"),
    )
    return shred.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("eid").cast("bigint").alias("sum_eid"),
        F.round(F.sum("val"), 2).alias("sum_v"),
        F.round(F.sum("val2"), 2).alias("sum_v2"),
        F.sum(F.col("absent").isNull().cast("int")).cast("bigint").alias("n_absent_null"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    JVM-side vector-math path (no UDF): transform + aggregate compile to
    codegen'd loops over the array. Elements are float32; both engines
    cast to double before squaring so the sums are bit-identical."""
    e = catalog.load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
    )


@register(
    "fn_struct_flatten",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, value
    FROM events
    """,
)
def fn_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct, then project it back to flat columns (flat output
    for cross-engine hashing — D5)."""
    ev = catalog.load(spark, sf_dir, "events")
    nested = ev.select(
        F.struct(
            F.col("user_id"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("value"),
        ).alias("s")
    )
    return nested.select(
        F.col("s.user_id").alias("user_id"),
        F.col("s.day").alias("day"),
        F.col("s.value").alias("value"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS xored,
           event_id << 2 AS shl,
           event_id >> 3 AS shr,
           CAST(bit_count(event_id) AS INTEGER) AS popcnt
    FROM events WHERE event_id < 1000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor, shifts, popcount — all-integer, so
    cross-engine exact by construction. (Spark `^` is xor; DuckDB `^`
    is power — its oracle uses `xor()`.)"""
    ev = catalog.load(spark, sf_dir, "events")
    return ev.where(F.col("event_id") < 1000).select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ user_id").alias("xored"),
        F.expr("shiftleft(event_id, 2)").alias("shl"),
        F.expr("shiftright(event_id, 3)").alias("shr"),
        F.bit_count("event_id").alias("popcnt"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE regexp_matches(props, '[0-9]{2}'))
               AS n_2digit,
           round(avg(CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '')
                          AS INTEGER)), 4) AS avg_k,
           count(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g'))
               AS n_masked
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface (CH match/extract/replaceRegexpAll): rlike
    predicate counts, capture-group extraction (numeric payload out of
    the JSON-ish props — the regex path, vs fn_json's parser path),
    and global replace (digit masking, the PII-scrub primitive at the
    character level). All codegen'd JVM regex; the empty-match ''
    sentinel goes through nullif before the ANSI int cast in BOTH
    engines so no-match rows stay NULL rather than erroring."""
    ev = catalog.load(spark, sf_dir, "events")
    k_num = F.nullif(F.regexp_extract("props", '"k": ([0-9]+)', 1), F.lit("")).cast(
        "int"
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("props").rlike("[0-9]{2}"), 1)).alias("n_2digit"),
            F.round(F.avg(k_num), 4).alias("avg_k"),
            F.count_distinct(
                F.regexp_replace("props", "[0-9]+", "#")
            ).alias("n_masked"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_array_setops",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority,
               list_sort(list_distinct(list(l_returnflag))) AS flags,
               list_sort(list_distinct(list(l_linestatus))) AS stats
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           array_to_string(flags, ',') AS flags,
           array_to_string(list_sort(list_intersect(flags, ['A', 'N'])), ',')
               AS flags_in_an,
           array_to_string(list_sort(list_filter(flags,
               x -> NOT list_contains(stats, x))), ',') AS flags_not_stats,
           array_to_string(list_sort(list_distinct(list_concat(flags, stats))), ',')
               AS all_codes
    FROM s ORDER BY o_orderpriority
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (CH arrayIntersect/arrayConcat/arrayFilter):
    per priority, the distinct flag set and its intersection /
    difference / union with other code sets — emitted as sorted CSV
    strings because array columns hash differently across engines'
    pandas conversions. All in-row HOFs after one grouped collect;
    the collect carries DISTINCT single-chars, not rows."""
    o = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    s = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.array_sort(F.collect_set("l_returnflag")).alias("flags"),
            F.array_sort(F.collect_set("l_linestatus")).alias("stats"),
        )
    )
    return s.select(
        "o_orderpriority",
        F.array_join("flags", ",").alias("flags"),
        F.array_join(
            F.array_sort(F.array_intersect("flags", F.array(F.lit("A"), F.lit("N")))),
            ",",
        ).alias("flags_in_an"),
        F.array_join(F.array_sort(F.array_except("flags", "stats")), ",").alias(
            "flags_not_stats"
        ),
        F.array_join(
            F.array_sort(F.array_distinct(F.concat("flags", "stats"))), ","
        ).alias("all_codes"),
    ).orderBy("o_orderpriority")


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
        SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
    )
    SELECT lang, source AS top_source, CAST(n AS BIGINT) AS n_docs
    FROM c
    QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, source) = 1
    ORDER BY lang
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with a STATED tie-break (CH `topK(1)` / SQL mode() leave
    ties unspecified — a cross-engine hash check requires determinism):
    the most frequent source per language, ties to the lexicographically
    smallest source. Count + max_by on a (count, reversed-source)
    struct: two narrow aggregations, no window sort."""
    docs = catalog.load(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    # min_by over (-n, source): lexicographic minimum = highest count,
    # then smallest source — the stated tie-break in ONE aggregate with
    # map-side partials (one candidate per group per partition crosses
    # the shuffle; the oracle's window formulation sorts partitions).
    win = F.min_by(F.struct("source", "n"), F.struct((-F.col("n")).alias("negn"), "source"))
    return (
        c.groupBy("lang")
        .agg(win.alias("w"))
        .select(
            "lang",
            F.col("w.source").alias("top_source"),
            F.col("w.n").cast("bigint").alias("n_docs"),
        )
        .orderBy("lang")
    )
