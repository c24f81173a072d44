"""Group O (behavior analytics, round 4 cont.) — cohort / liveness /
interval-containment operators over the events stream.

Three operators every product-analytics warehouse (the workload pg2ch
feeds into ClickHouse — SURVEY §2.1's analytics delegation) runs daily:
the cohort retention matrix, a point-in-interval containment join, and
the rolling DAU/WAU/MAU liveness rollup. All pure DataFrame plans;
every axis is integer epoch-day / epoch-second (determinism rule D3 —
no date dtype crosses the engine boundary).

Scale notes (10^12-row event streams):
- cohort matrix: ZERO joins — one shuffle on user_id produces
  (cohort_day, distinct-day set) per user, and because each user owns
  exactly one exploded row per active day, the per-cell count is a
  plain count(*), never COUNT(DISTINCT). The per-user day set is
  bounded by the observation span's distinct days, not by event volume.
- point-in-interval: no equi-key exists, so the join is blocked on a
  coarse time grain — intervals explode to the hour-grains they span
  (bounded by span/grain ≤ 24), points carry their single grain, and
  the match is a shuffled equi-join + residual range filter. The plan
  never degenerates to BroadcastNestedLoopJoin (plan-tested); output
  size is the true concurrency, which no plan can shrink.
- liveness rollup: trailing-window COUNT(DISTINCT) decomposed into a
  bounded 30× contribution explode + min-offset collapse — two
  shuffles, no distinct-expand, no window state. The explode factor is
  the window length, a constant; presence (user × day) is already
  ~3 orders smaller than raw events.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.caching import eager_persist
from pg2ch_spark.operators.intervals import (
    interval_overlap_pairs,
    point_in_interval,
)
from pg2ch_spark.registry import register

# ---------------------------------------------------------------------------
# Cohort retention matrix — users bucketed by debut day, counted per
# (cohort, day-offset) cell.


@register(
    "events_cohort_matrix",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        FROM events
    ), f AS (
        SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
    ), a AS (
        SELECT DISTINCT user_id, day FROM ev
    )
    SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
           count(*) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by debut day, distinct
    actives per (cohort_day, day_offset) cell — the triangle chart
    behind every retention dashboard.

    The textbook plan joins a per-user firsts table back to the
    presence table (two aligned shuffles) and runs COUNT(DISTINCT) per
    cell. This one does neither: a single groupBy(user_id) yields each
    user's debut day AND distinct-day set together, the set explodes
    map-side into one row per (user, active day), and since a user
    contributes at most one row per cell the cell count is a plain
    count(*). One wide shuffle on user_id + one cheap agg shuffle on
    the ~|window|²/2 cell keys. The day-set is bounded by the
    observation span's distinct active days (as in
    `events_day_streaks`), never by raw event volume — at 10^12
    events the first shuffle carries users × active-days, the same
    presence relation the join plan would shuffle twice.
    """
    ev = catalog.load(spark, sf_dir, "events")
    day = (catalog.ts_epoch_s(ev) / F.lit(86400)).cast("long")
    per_user = (
        ev.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"), F.collect_set("day").alias("days"))
    )
    return (
        per_user.select("cohort_day", F.explode("days").alias("day"))
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Point-in-interval containment join — no equi-key; blocked on a coarse
# time grain so the plan is a shuffled equi-join, not a nested loop.

_GRAIN_S = 3600  # blocking grain: 1 hour of epoch seconds

# join_point_in_interval and events_concurrency_sweep are DECLARED to
# share one semantic (the tests compare them row-for-row), so the span/
# point derivation and the oracle live once — an edit to the span
# definition cannot drift the pair apart.
_CONCURRENCY_ORACLE = """
    WITH spans AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
               min(CAST(floor(epoch(ts)) AS BIGINT)) AS lo,
               max(CAST(floor(epoch(ts)) AS BIGINT)) AS hi
        FROM events GROUP BY 1, 2
    ), p AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, count(*) AS n_active
    FROM p JOIN spans s ON p.t >= s.lo AND p.t <= s.hi
    GROUP BY 1, 2
    ORDER BY 1
    """


def _daily_spans_and_purchases(spark: SparkSession, sf_dir: str):
    """(spans, points) for the concurrency pair: per-user-day activity
    spans [min(s), max(s)] and purchase instants."""
    ev = catalog.load(spark, sf_dir, "events")
    sec = catalog.ts_epoch_s(ev)
    base = ev.select("event_id", "user_id", "event_type", sec.alias("s"))
    spans = base.groupBy(
        "user_id", (F.col("s") / F.lit(86400)).cast("long").alias("day")
    ).agg(F.min("s").alias("lo"), F.max("s").alias("hi")).select("lo", "hi")
    points = base.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("s").alias("t"),
    )
    return spans, points


@register("join_point_in_interval", oracle=_CONCURRENCY_ORACLE)
def join_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency at purchase time: for each purchase, how many daily
    activity spans (any user) contain its instant — a point-in-interval
    join with NO equi-key, the case `join_theta_range`'s orderkey
    equi-band cannot cover.

    The classic hazard is Spark falling back to
    BroadcastNestedLoopJoin (every point × every interval). Blocking
    fixes it: each span explodes to the hour-grains it covers (≤ 24 —
    the grain is chosen at span scale, so the blowup is a small
    constant), each point carries its single grain, and the match is a
    plain shuffled equi-join on the grain plus a residual lo ≤ t ≤ hi
    filter. A (point, span) pair can meet in only one grain — the
    point's own — so no pair dedup is needed and count(*) per point is
    exact. Plan-tested: no BNLJ / CartesianProduct in the physical
    plan. Grain skew (everyone active at the peak hour) composes with
    the salting pattern of `join_salted_skew`.

    Scale contract: this is the PAIR-IDENTITY shape — its intermediate
    is the (point, span) match set, so cost scales with |pairs| (10×
    users × 10× purchases probe: 100× pairs, 53.6× time — per-pair
    cost actually halves; BASELINE.md). It is therefore the OPT-IN
    path of `intervals.point_in_interval(pairs=True)`: the library
    default answers the same question via the sweep with no pair set
    at all (`events_concurrency_sweep` is that default, probe 2.7×).
    Reach for this form only for queries that go on to USE the pairs
    (e.g. joining span attributes onto each match).
    """
    spans, points = _daily_spans_and_purchases(spark, sf_dir)
    return (
        point_in_interval(points, spans, pairs=True, grain_s=_GRAIN_S)
        .groupBy("purchase_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# Sweep-line concurrency — the same answer as join_point_in_interval
# with NO pair materialization: counting interval containment never
# needs the pairs, only two global ranks.

_SWEEP_SHARD_S = 3600  # range-shard width for the distributed prefix sum


@register("events_concurrency_sweep", oracle=_CONCURRENCY_ORACLE)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency at purchase time, the sweep-line way: identical
    output (and oracle) to `join_point_in_interval`, but the count of
    spans containing t is computed as #(lo ≤ t) − #(hi < t) — two
    global ranks — so the |matches| pair set is NEVER materialized.

    Each span emits two delta markers (+1 at lo, −1 at hi+1), each
    purchase a zero-delta query marker; the running delta sum read at
    a query position IS its concurrency (markers sort before queries
    at equal time, making both boundaries inclusive-exact). The
    running sum uses the distributed two-pass prefix sum of
    `pipeline_pack_sequences`: range-shard on the time axis, window
    cumsum within each bounded shard, per-shard totals prefix-summed
    (|shards| rows) and broadcast back. Cost is O(spans + points) rows
    through two shuffles, versus the blocked join's O(pairs)
    intermediate — at 10× users × 10× purchases the join's pair set
    grows 100× while the sweep's input grows 10× (probe: 53.6× vs
    ~2×, BASELINE.md). Query rows tie-sort after all equal-time
    markers and carry delta 0, so the cumsum they read is
    order-independent — deterministic under any shuffle.

    This IS `intervals.point_in_interval`'s default path — the library
    contract a user gets unless they opt into pairs=True."""
    spans, points = _daily_spans_and_purchases(spark, sf_dir)
    return (
        point_in_interval(points, spans, shard_s=_SWEEP_SHARD_S)
        .select("purchase_id", "user_id", "n_active")
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# Interval × interval overlap join — symmetric containment's harder
# sibling: a pair can share MANY blocking grains, so the join needs a
# dedup rule; the first-common-grain condition provides it join-time,
# with no DISTINCT pass.

_MONITOR_MOD = 50  # monitor-set selector: user_id % 50 == 0


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH spans AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
               min(CAST(floor(epoch(ts)) AS BIGINT)) AS lo,
               max(CAST(floor(epoch(ts)) AS BIGINT)) AS hi
        FROM events GROUP BY 1, 2
    )
    SELECT v.user_id AS monitor_user, v.day,
           count(*) AS n_overlaps,
           CAST(sum(least(v.hi, o.hi) - greatest(v.lo, o.lo)) AS BIGINT)
               AS overlap_s
    FROM spans v
    JOIN spans o
      ON v.user_id % {_MONITOR_MOD} = 0
     AND o.user_id <> v.user_id
     AND v.lo <= o.hi AND o.lo <= v.hi
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: for each monitor-set user's
    daily activity span, every OTHER user's span it overlaps, reduced
    to per-(monitor, day) overlap counts and total overlapping
    seconds — the concurrent-activity audit around designated users.

    Harder than `join_point_in_interval`'s point case: two intervals
    can share MANY hour grains, so naive grain blocking double-counts
    every pair. The fix is the first-common-block rule, applied as a
    join-time predicate — a surviving pair is kept only in the block
    containing max(lo_v, lo_o): exact dedup with NO distinct pass and
    no pair key re-shuffle (see `intervals.interval_overlap_pairs`,
    which this routes through). Hour blocks whose span count exceeds
    the hot threshold escalate to minute blocks on BOTH sides — the
    skewed-hour guardrail: one peak hour can no longer turn its bucket
    quadratic in the hour's population. The match stays a shuffled
    equi-join (plan-tested: no BNLJ), and the monitor-set filter
    bounds output to |monitors| × |concurrent spans| — the irreducible
    answer size of the pair contract. When only count/total-seconds
    are needed, `intervals.interval_overlap_aggregates` answers with
    NO pair set at all (endpoint prefix sums) — that is the library
    default for overlap-shaped asks; this registered key is the
    declared pair-identity opt-in.
    """
    ev = catalog.load(spark, sf_dir, "events")
    sec = catalog.ts_epoch_s(ev)
    # The span table feeds THREE plan branches (probe side, build side,
    # and the hot-hour census inside interval_overlap_pairs); without
    # the shared cache each re-aggregates the events scan (r5 bench:
    # +1.4 s at sf0.1 for the third pass alone). Spans are user×day
    # rows — bounded far below event volume at any scale.
    spans = eager_persist(
        ev.select("user_id", sec.alias("s"))
        .groupBy("user_id", (F.col("s") / F.lit(86400)).cast("long").alias("day"))
        .agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    )
    v = spans.where(F.col("user_id") % _MONITOR_MOD == 0).select(
        F.col("user_id").alias("monitor_user"),
        "day",
        F.col("lo").alias("v_lo"),
        F.col("hi").alias("v_hi"),
    )
    o = spans.select(
        F.col("user_id").alias("o_user"),
        F.col("lo").alias("o_lo"),
        F.col("hi").alias("o_hi"),
    )
    return (
        interval_overlap_pairs(
            v, o,
            probe_lo="v_lo", probe_hi="v_hi",
            build_lo="o_lo", build_hi="o_hi",
            grain_s=_GRAIN_S,
        )
        .where(F.col("o_user") != F.col("monitor_user"))
        .groupBy("monitor_user", "day")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum(
                F.least(F.col("v_hi"), F.col("o_hi"))
                - F.greatest(F.col("v_lo"), F.col("o_lo"))
            )
            .cast("bigint")
            .alias("overlap_s"),
        )
        .orderBy("monitor_user", "day")
    )


# ---------------------------------------------------------------------------
# Rolling liveness rollup — DAU/WAU/MAU per day, exact, without a
# trailing-window COUNT(DISTINCT).

_MAU_WINDOW = 30
_WAU_WINDOW = 7


@register(
    "events_active_rollup",
    oracle=f"""
    WITH pres AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM pres
    ), mo AS (
        SELECT d.day, p.user_id, min(d.day - p.day) AS min_off
        FROM days d
        JOIN pres p ON p.day <= d.day AND p.day > d.day - {_MAU_WINDOW}
        GROUP BY 1, 2
    )
    SELECT day,
           count(*) FILTER (WHERE min_off = 0) AS dau,
           count(*) FILTER (WHERE min_off < {_WAU_WINDOW}) AS wau,
           count(*) AS mau
    FROM mo GROUP BY day ORDER BY day
    """,
)
def events_active_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU / trailing-7 WAU / trailing-30 MAU per observed day.

    A trailing-window COUNT(DISTINCT) OVER is either unsupported or
    O(window × users) of state per day; the multiple-COUNT(DISTINCT)
    aggregate form triggers Spark's Expand (3× the rows). Neither
    survives 10^12 events. The scale-correct decomposition: distinct
    presence (user, day) — already ~3 orders smaller than raw events —
    explodes each row to the {_MAU_WINDOW} target days it can vouch
    for (a bounded, map-side 30×), a groupBy (target, user) keeps the
    MINIMUM offset, and the final per-day agg derives all three
    metrics from conditional counts over min_off: = 0 → seen today
    (DAU), < {_WAU_WINDOW} → seen this week (WAU), any → seen this
    month (MAU). Two shuffles, plain counts, no distinct-expand, no
    window state. Targets are semi-joined (broadcast — the day grid is
    tiny) to observed days so the grid never extends past the data.
    """
    ev = catalog.load(spark, sf_dir, "events")
    day = (catalog.ts_epoch_s(ev) / F.lit(86400)).cast("long")
    pres = ev.select("user_id", day.alias("day")).distinct()
    days = pres.select(F.col("day").alias("target")).distinct()
    contrib = pres.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(_MAU_WINDOW - 1))).alias("off"),
    ).select("user_id", (F.col("day") + F.col("off")).alias("target"), "off")
    min_off = (
        contrib.join(F.broadcast(days), "target", "left_semi")
        .groupBy("target", "user_id")
        .agg(F.min("off").alias("min_off"))
    )
    return (
        min_off.groupBy("target")
        .agg(
            F.count(F.when(F.col("min_off") == 0, 1)).alias("dau"),
            F.count(F.when(F.col("min_off") < _WAU_WINDOW, 1)).alias("wau"),
            F.count(F.lit(1)).alias("mau"),
        )
        .select(F.col("target").alias("day"), "dau", "wau", "mau")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Consecutive-day streaks — gaps-and-islands at day granularity, the
# engagement metric next to the DAU rollup.


@register(
    "events_day_streaks",
    oracle="""
    WITH pres AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        FROM events
    ), isl AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS island
        FROM pres
    ), runs AS (
        SELECT user_id, island, count(*) AS run_len
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS active_days,
           count(*) AS n_streaks,
           CAST(max(run_len) AS BIGINT) AS max_streak
    FROM runs GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (plus total
    active days and streak count) — the engagement metric every
    retention dashboard pairs with `events_active_rollup`.

    Gaps-and-islands with ONE Exchange end-to-end: the naive chain
    (distinct presence → row_number window → island rollup) costs
    three user-key shuffles, because distinct() partitions on
    (user_id, day) — which does NOT satisfy the window's user_id
    clustering — and the window's output doesn't pre-split the island
    key. Instead: one groupBy(user_id) collects the distinct day SET
    (map-side partials dedup), `array_sort` + `posexplode` rebuild the
    ordered sequence IN-ROW (day − position ≙ day − row_number —
    constant exactly within a consecutive run), and both downstream
    rollups cluster by user_id, so HashPartitioning(user_id) carries
    through (plan-tested: exactly one user-key Exchange). The per-user
    day set is bounded by the observation window, never event volume.
    """
    ev = catalog.load(spark, sf_dir, "events")
    day = (catalog.ts_epoch_s(ev) / F.lit(86400)).cast("long")
    per_user = (
        ev.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("day")).alias("days"))
    )
    isl = per_user.select(
        "user_id", F.posexplode("days").alias("pos", "day")
    ).select("user_id", (F.col("day") - F.col("pos")).alias("island"))
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return (
        runs.groupBy("user_id")
        .agg(
            F.sum("run_len").cast("bigint").alias("active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("run_len").cast("bigint").alias("max_streak"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Segment overlap matrix — ClickHouse groupBitmap{And,Or} territory:
# audience intersections without any pairwise user-list join.


@register(
    "events_segment_overlap",
    oracle="""
    WITH sets AS (
        SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
        FROM events GROUP BY user_id
    ), pairs AS (
        SELECT a.t AS type_a, b.t AS type_b
        FROM sets, unnest(types) AS a(t), unnest(types) AS b(t)
        WHERE a.t <= b.t
    )
    SELECT type_a, type_b, count(*) AS n_users
    FROM pairs GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
)
def events_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-segment overlap matrix: for every (unordered) pair of
    event types, how many users did BOTH — the intersection table
    ClickHouse serves with groupBitmapAnd over per-segment bitmaps.

    The naive plan joins per-type user lists pairwise — |types|²
    row-scale semi-joins. This one never joins: ONE groupBy(user_id)
    collects each user's distinct type set (map-side partial dedup; the
    set is bounded by |types|, a constant), the ≤|types|² pairs explode
    IN-ROW from that set, and a user contributes each pair at most once
    — so the matrix cell is a plain count(*), the same
    joinless-and-DISTINCT-less shape as `events_cohort_matrix`. The
    diagonal (a = a) doubles as each segment's size. One wide shuffle
    on user_id + one constant-size agg shuffle, at any event volume.
    """
    ev = catalog.load(spark, sf_dir, "events")
    sets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    pairs = (
        sets.select(F.explode("types").alias("type_a"), "types")
        .select("type_a", F.explode("types").alias("type_b"))
        .where(F.col("type_a") <= F.col("type_b"))
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Conversion-time quantiles per cohort week — time-to-convert is the
# metric funnels and retention curves both feed.


@register(
    "events_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t_s
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
        SELECT s.user_id, s.t_s,
               min(CAST(floor(epoch(p.ts)) AS BIGINT)) - s.t_s AS delta_s
        FROM s LEFT JOIN events p
          ON p.user_id = s.user_id AND p.event_type = 'purchase'
         AND CAST(floor(epoch(p.ts)) AS BIGINT) > s.t_s
        GROUP BY s.user_id, s.t_s
    )
    SELECT t_s // 604800 AS week,
           count(*) AS n_signup,
           count(delta_s) AS n_converted,
           round(count(delta_s) / CAST(count(*) AS DOUBLE), 4) AS cvr,
           round(quantile_cont(delta_s, 0.5), 4) AS p50_s,
           round(quantile_cont(delta_s, 0.9), 4) AS p90_s
    FROM conv GROUP BY week ORDER BY week
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion per signup-cohort week: conversion
    rate plus p50/p90 of seconds-to-first-purchase — the funnel's
    "how fast", next to `events_window_funnel`'s "how many".

    First-signup extraction and the earliest-later-purchase reduction
    are both min-aggregations over ONE user-key join (the `join_asof`
    shape — an inequality conjunct riding the equi-join, collapsed by
    min; no window, no per-user array). Non-converters survive through
    the left join as NULL deltas so the cohort denominator is true
    signups, and count(delta) / count(*) is the conversion rate. The
    cohort rollup aggregates user-level rows (already 3+ orders
    smaller than events); exact interpolated quantiles on integer
    seconds — midpoints are dyadic-exact, so 4dp rounding is stable
    (the `agg_percentiles` contract; at 100 TB swap in the mergeable
    approx_percentile sketch).
    """
    ev = catalog.load(spark, sf_dir, "events")
    sec = catalog.ts_epoch_s(ev)
    s = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id", sec.alias("t"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_s"))
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), sec.alias("t_p")
    )
    conv = (
        s.join(p, (s.user_id == p.p_user) & (F.col("t_p") > F.col("t_s")), "left")
        .groupBy("user_id", "t_s")
        .agg((F.min("t_p") - F.first("t_s")).alias("delta_s"))
    )
    return (
        conv.groupBy((F.col("t_s") / F.lit(604800)).cast("long").alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n_signup"),
            F.count("delta_s").alias("n_converted"),
            F.round(
                F.count("delta_s") / F.count(F.lit(1)).cast("double"), 4
            ).alias("cvr"),
            F.round(F.expr("percentile(delta_s, 0.5D)"), 4).alias("p50_s"),
            F.round(F.expr("percentile(delta_s, 0.9D)"), 4).alias("p90_s"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# RFM segmentation — the recency/frequency/monetary quartile grid.


@register(
    "events_rfm_segmentation",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS recency_day,
               count(*) AS frequency,
               coalesce(CAST(round(sum(CAST(value AS DECIMAL(18,6)))
                                   FILTER (WHERE event_type = 'purchase'), 2)
                             AS DOUBLE), 0.0) AS monetary
        FROM events GROUP BY user_id
    ), tiered AS (
        SELECT user_id, monetary,
               ntile(4) OVER (ORDER BY recency_day DESC, user_id) AS r_tier,
               ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_tier,
               ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_tier
        FROM per_user
    )
    SELECT r_tier, f_tier, m_tier, count(*) AS n_users,
           round(avg(monetary), 4) AS avg_monetary
    FROM tiered GROUP BY r_tier, f_tier, m_tier
    ORDER BY r_tier, f_tier, m_tier
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: users quartiled independently on Recency
    (latest active day), Frequency (event count), and Monetary
    (decimal-mediated purchase sum, 0 for never-purchased), then
    counted per (r, f, m) cell — the 4×4×4 grid behind lifecycle
    marketing. Ties inside each ntile break on user_id, so the tier
    assignment is total-ordered and engine-independent; the monetary
    sum is NULL-safe on both engines (coalesce after the FILTER sum).

    One events shuffle builds the per-user table; each quartile is then
    `windows.ntile_distributed` — the two-pass closed-form rank with NO
    unpartitioned row-level window (VERDICT r6 item 2: the previous
    three global ntile sorts were each a single task over the
    users-scale table at 10^9 users). Massive ties — monetary = 0 for
    every never-purchased user — sub-shard on uid ranges inside the
    tied value, so the biggest tie costs |tie|/4096 window tasks, not
    one (plan-tested in tests/test_plans.py).
    """
    from pg2ch_spark.operators.windows import ntile_distributed

    ev = catalog.load(spark, sf_dir, "events")
    day = (catalog.ts_epoch_s(ev) / F.lit(86400)).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.max(day).alias("recency_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,6)"),
                    )
                ),
                2,
            ).cast("double"),
            F.lit(0.0),
        ).alias("monetary"),
    )
    # The three quartiles are INDEPENDENT rankings of the same table.
    # r8: MELT to (user_id, metric, value) rows and run ONE
    # partition-aware ntile_distributed over 3N thin rows instead of
    # three pipelines over N rows: same shuffled bytes, a third of the
    # stages, one slim pivot+join back instead of three user_id joins
    # (the r7 form ran the whole groupBy/window/join family three
    # times). Exactness of the melt's double casts (ADVICE r8 raised
    # the 2^53 bound on monetary): the monetary QUARTILE CONTRACT is
    # itself double-ordered — the oracle computes `CAST(round(sum)
    # AS DOUBLE) AS monetary` and then ntiles `ORDER BY monetary
    # DESC`, and the r7 typed form ranked the same double column — so
    # ranking the double here is exact at EVERY magnitude: two decimal
    # sums that collapse to one double are a TIE in the declared
    # semantics (broken by user_id), not a precision loss. An exact
    # cents-scaled long ranking would DIVERGE from the contract in
    # that regime. The long→double casts on recency_day (a day count)
    # and frequency (a per-user event count) are exact below 2^53,
    # which both satisfy by construction on any physical corpus.
    from pg2ch_spark.caching import eager_persist

    per_user = eager_persist(per_user)
    melted = per_user.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    F.col("recency_day").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("f").alias("metric"),
                    F.col("frequency").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("m").alias("metric"),
                    F.col("monetary").cast("double").alias("value"),
                ),
            )
        ).alias("mv"),
    ).select("user_id", F.col("mv.metric").alias("metric"), F.col("mv.value").alias("value"))
    tiers = ntile_distributed(
        melted, "value", "user_id",
        n=4, out_col="tier", value_width=256.0, part_col="metric",
    )
    pivoted = (
        tiers.groupBy("user_id")
        .pivot("metric", ["r", "f", "m"])
        .agg(F.first("tier"))
        .select(
            "user_id",
            F.col("r").alias("r_tier"),
            F.col("f").alias("f_tier"),
            F.col("m").alias("m_tier"),
        )
    )
    tiered = per_user.join(pivoted, "user_id")
    return (
        tiered.groupBy("r_tier", "f_tier", "m_tier")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
        )
        .orderBy("r_tier", "f_tier", "m_tier")
    )


# ---------------------------------------------------------------------------
# Cumulative drift detection — Page's CUSUM statistic (unclamped) over
# the daily value series per event type.


@register(
    "events_cusum_drift",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
               sum(CAST(value AS DECIMAL(18,6))) AS v
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, sum(v) AS total, count(*) AS n_days
        FROM daily GROUP BY event_type
    ), cum AS (
        SELECT d.event_type, d.day,
               row_number() OVER w AS t,
               sum(d.v) OVER (PARTITION BY d.event_type ORDER BY d.day
                              ROWS UNBOUNDED PRECEDING) AS cum_v,
               tt.total, tt.n_days
        FROM daily d JOIN tot tt USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
    ), drift AS (
        SELECT event_type, day,
               abs(CAST(cum_v AS DOUBLE)
                   - CAST(t * total AS DOUBLE) / n_days) AS dr
        FROM cum
    )
    SELECT event_type,
           CAST(max(n2.n_days) AS BIGINT) AS n_days,
           round(max(dr), 4) AS max_drift,
           min(day) FILTER (WHERE round(dr, 4) =
               (SELECT round(max(d2.dr), 4) FROM drift d2
                WHERE d2.event_type = drift.event_type)) AS drift_day
    FROM drift JOIN tot n2 USING (event_type)
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative drift detection per event type: Page's CUSUM
    statistic (unclamped) over the daily value series — max over t of
    |Σ₁..t(xᵢ) − t·μ|, with the day it peaks. A level shift in the
    series shows up as a drift mountain whose summit IS the
    change-point estimate; the monitoring sibling of
    `events_anomaly_zscore` (point outliers) for SUSTAINED shifts.

    Exactness for a cumulative float statistic (the
    `orders_pareto_abc` discipline): daily sums and the running
    cumulative are exact DECIMAL, t·total is an exact decimal×int, and
    each drift value is ONE float subtraction of two IEEE-exact terms
    (cum − t·total/n) — no float accumulation order anywhere, so the
    argmax day is engine-stable (ties resolve to the earliest day).
    Windows run over the per-(type, day) aggregate (bounded by the
    calendar, not event volume).
    """
    ev = catalog.load(spark, sf_dir, "events")
    day = (catalog.ts_epoch_s(ev) / F.lit(86400)).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v")
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    cum = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn("t", F.row_number().over(w_ord))
        .withColumn(
            "cum_v",
            F.sum("v").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    dr = F.abs(
        F.col("cum_v").cast("double")
        - (F.col("t") * F.col("total")).cast("double") / F.col("n_days")
    )
    drift = cum.select("event_type", "day", "n_days", dr.alias("dr"))
    w_max = Window.partitionBy("event_type")
    return (
        drift.withColumn("mx", F.max(F.round(F.col("dr"), 4)).over(w_max))
        .groupBy("event_type")
        .agg(
            F.max("n_days").cast("bigint").alias("n_days"),
            F.round(F.max("dr"), 4).alias("max_drift"),
            F.min(
                F.when(F.round(F.col("dr"), 4) == F.col("mx"), F.col("day"))
            ).alias("drift_day"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Calendar seasonality matrix — the day-of-week × hour-of-day heatmap.


@register(
    "events_seasonality_matrix",
    oracle="""
    WITH base AS (
        SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow,
               (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS hod,
               value
        FROM events
    )
    SELECT dow, hod, count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS value_total
    FROM base GROUP BY dow, hod ORDER BY dow, hod
    """,
)
def events_seasonality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity seasonality: the day-of-week × hour-of-day heatmap
    (0=Sunday, UTC hours) with event counts and decimal-safe value
    mass per cell — the calendar fingerprint behind load forecasting
    and anomaly baselines (`events_cusum_drift` flags WHEN something
    shifted; this shows the shape it shifted from).

    Both axes are PURE INTEGER arithmetic on epoch seconds — dow =
    (epoch_day + 4) mod 7 anchors on 1970-01-01 being a Thursday —
    instead of each engine's dayofweek()/strftime conventions
    (1-vs-0-based, locale week starts), which is exactly the kind of
    silent cross-engine skew the integer-time discipline (D3) exists
    to avoid. One map-side-combined shuffle onto ≤ 168 cells.
    """
    ev = catalog.load(spark, sf_dir, "events")
    sec = catalog.ts_epoch_s(ev)
    return (
        ev.select(
            ((sec / F.lit(86400)).cast("long") + 4) .alias("d4"),
            sec.alias("s"),
            "value",
        )
        .select(
            F.pmod("d4", F.lit(7)).alias("dow"),
            ((F.col("s") % 86400) / F.lit(3600)).cast("long").alias("hod"),
            "value",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("value_total"),
        )
        .orderBy("dow", "hod")
    )
