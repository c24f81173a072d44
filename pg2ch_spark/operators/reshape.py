"""Reshape and time-series operators (round 3): unpivot, gap-fill,
cumulative-distinct, embedding mean-pool.

ClickHouse-side analytics that pg2ch feeds routinely need the long/wide
pivot pair (``agg_pivot`` is the wide direction; ``corpus_unpivot`` the
long one), gap-free time grids (CH ``WITH FILL``), and running uniques
(CH ``uniqExact`` over cumulative windows). The embedding mean-pool is
the vector-column counterpart a training pipeline uses for per-class
centroids and pooled features.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "corpus_unpivot",
    oracle="""
    SELECT measure, count(*) AS n, round(sum(v), 2) AS total
    FROM (
        SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY measure
    ORDER BY measure
    """,
)
def corpus_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (CH: arrayJoin over a measure map; SQL:
    UNPIVOT) of lineitem's four numeric measures, then a per-measure
    rollup. ``DataFrame.unpivot`` is a zero-shuffle map operator —
    each input row yields 4 (measure, value) rows inside the stage —
    and the rollup groups on a 4-value key, so the shuffle carries one
    partial per measure per partition. The oracle states the same
    result as 4 scans; Spark's plan reads the fact ONCE."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return (
        li.unpivot([], list(_MEASURES), "measure", "v")
        .groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 2).alias("total"),
        )
        .orderBy("measure")
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr
        FROM events
    ),
    b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
    grid AS (
        SELECT t.event_type, r.hr
        FROM (SELECT DISTINCT event_type FROM e) t, b,
             LATERAL unnest(range(b.lo, b.hi + 1)) AS r(hr)
    ),
    c AS (SELECT event_type, hr, count(*) AS n FROM e GROUP BY 1, 2)
    SELECT g.event_type, g.hr * 3600 AS hour_s,
           COALESCE(c.n, 0) AS n
    FROM grid g LEFT JOIN c USING (event_type, hr)
    ORDER BY g.event_type, hour_s
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample (CH ``GROUP BY ... WITH FILL``, the
    hypertable-rollup idiom): every (event_type, hour) bucket between
    the corpus' first and last hour, zero-filled where no events fell.
    The dense grid is generated, not stored: a 1-row global bounds
    aggregate crossJoins (broadcast) the distinct types, and
    ``sequence`` explodes the hour range — grid size is
    |types| × |hours| regardless of event count, so at 100 TB the
    grid stays tiny while the counts aggregate map-side."""
    ev = catalog.load(spark, sf_dir, "events")
    hr = (catalog.ts_epoch_s(ev) / F.lit(3600)).cast("long")  # floor: epochs positive
    e = ev.select("event_type", hr.alias("hr"))
    bounds = e.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    counts = e.groupBy("event_type", "hr").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        grid.join(counts, ["event_type", "hr"], "left_outer")
        .select(
            "event_type",
            (F.col("hr") * 3600).alias("hour_s"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n"),
        )
        .orderBy("event_type", "hour_s")
    )


@register(
    "win_cum_distinct_users",
    oracle="""
    WITH firsts AS (
        SELECT event_type, user_id,
               min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS first_day
        FROM events GROUP BY event_type, user_id
    ),
    news AS (
        SELECT event_type, first_day, count(*) AS new_users
        FROM firsts GROUP BY event_type, first_day
    )
    SELECT event_type, first_day * 86400 AS day_s, new_users,
           CAST(sum(new_users) OVER (
               PARTITION BY event_type ORDER BY first_day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM news
    ORDER BY event_type, day_s
    """,
)
def win_cum_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per event type by day — the
    cumulative-uniques curve every growth dashboard wants. COUNT
    (DISTINCT) OVER a running frame is either unsupported or O(n²)
    state; the scale-correct decomposition is first-occurrence
    extraction (min day per (type, user) — one shuffle on the pair
    key) followed by a plain running SUM of the per-day debut counts.
    Output rows exist for days where at least one user debuted (the
    curve's knots; gap-fill composes via ``events_gap_fill``)."""
    ev = catalog.load(spark, sf_dir, "events")
    day = (catalog.ts_epoch_s(ev) / F.lit(86400)).cast("long")
    firsts = (
        ev.select("event_type", "user_id", day.alias("day"))
        .groupBy("event_type", "user_id")
        .agg(F.min("day").alias("first_day"))
    )
    news = firsts.groupBy("event_type", "first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return news.select(
        "event_type",
        (F.col("first_day") * 86400).alias("day_s"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    ).orderBy("event_type", "day_s")


_POOL_DIMS = 4


@register(
    "embedding_mean_pool",
    oracle=f"""
    SELECT label, CAST(i AS INTEGER) AS dim,
           round(avg(embedding[CAST(i AS BIGINT)]), 5) AS mean_v
    FROM embeddings, (SELECT unnest(range(1, {_POOL_DIMS + 1})) AS i)
    GROUP BY label, i
    ORDER BY label, dim
    """,
)
def embedding_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label element-wise mean of the embedding vectors (class
    centroids / mean pooling), first {dims} dimensions. The vector is
    SLICED before posexplode — column pruning for arrays has to be
    done by hand — so the shuffle carries |labels| × {dims} partial
    sums, not the full 64-dim corpus. Rounded to 5 decimals: the two
    engines sum identical float32 values in different orders."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.slice("embedding", 1, _POOL_DIMS)))
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(F.round(F.avg("col"), 5).alias("mean_v"))
        .orderBy("label", "dim")
    )
