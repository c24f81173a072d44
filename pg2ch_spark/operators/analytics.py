"""Event-analytics and sketch operators (SURVEY §2.3 addendum, round 2
late batch): ClickHouse argMax/argMin, gap-based batch sessionization,
sequenceMatch-with-negation, an ORC format roundtrip, benchmark
decontamination (cross-set n-gram containment — the training-pipeline
op that near-dedup does NOT cover), and mergeable HLL sketches
(uniqState/uniqMerge parity).

Registered last (registry.load_all): earlier groups keep their
registration seniority until externally verified.
"""

from __future__ import annotations

import textwrap

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark import registry
from pg2ch_spark.registry import register

# ---------------------------------------------------------------------------
# argMax / argMin — ClickHouse's most-used non-standard aggregates
# (pg2ch users routinely keep "latest row per key" views this way).


@register(
    "agg_argmax",
    oracle="""
    WITH ranked AS (
        SELECT event_type, user_id, value, event_id,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id DESC) AS rmax,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value ASC, event_id ASC) AS rmin
        FROM events WHERE value IS NOT NULL
    ),
    hi AS (SELECT event_type, user_id AS top_user, round(value, 2) AS max_value
           FROM ranked WHERE rmax = 1),
    lo AS (SELECT event_type, user_id AS bottom_user, round(value, 2) AS min_value
           FROM ranked WHERE rmin = 1)
    SELECT event_type, top_user, max_value, bottom_user, min_value
    FROM hi JOIN lo USING (event_type)
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMax(user_id, value)`` / ``argMin``: the value of
    one column at the extremum of another, per group. Spark's
    ``max_by``/``min_by`` are the exact built-in analog — a single
    hash aggregate with map-side partials (each partition carries one
    candidate per group into the shuffle), where the oracle's
    row_number formulation would sort whole partitions.

    Ties broken deterministically by (value, event_id) lexicographic
    struct ordering — both engines state the same tie rule. NULL
    values are excluded BEFORE grouping on both sides: Spark's struct
    comparator sorts a NULL field smallest (min_by would elect a
    NULL-value row) while DuckDB's window default is NULLS LAST in
    both directions — divergent bare semantics, so the operator pins
    "extrema over valued events" (caught by the 10%-NULL randomized
    corpus, round 4)."""
    ev = catalog.load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.max_by("user_id", F.struct("value", "event_id")).alias("top_user"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.min_by("user_id", F.struct("value", "event_id")).alias("bottom_user"),
        F.round(F.min("value"), 2).alias("min_value"),
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization — the batch counterpart of stream_session:
# same 30-minute idle-gap rule, run over the full history at rest.

_SESSION_GAP_S = 30 * 60


@register(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
        -- whole-second event times, matching the Spark side's
        -- CAST(ts AS LONG): the gap rule and the duration must use the
        -- SAME truncation or boundaries diverge on fractional seconds
        SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS t, value, event_id,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                         > {_SESSION_GAP_S}
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, t, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           max(t) - min(t) AS duration_s,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS value_total
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts when a user is idle
    > 30 min. lag-over-window flags boundaries, a running sum numbers
    sessions, then a per-(user, session) rollup.

    One Exchange total: the lag window and the running-sum window both
    hash-partition by user_id, and HashPartitioning(user_id) satisfies
    the ClusteredDistribution(user_id, session_id) the final aggregate
    needs — Spark reuses the partitioning through all three steps.
    Per-user state never materializes as an array (contrast the funnel
    fold), so a 10M-event user costs window streaming, not memory."""
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        "event_id",
        F.when(gap.isNull() | (gap > _SESSION_GAP_S), 1).otherwise(0).alias("new_s"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "value",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("bigint")
        .alias("duration_s"),
        # decimal-mediated sum (order-insensitive — see cdc_summing_final)
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("value_total"),
    )


# ---------------------------------------------------------------------------
# sequenceMatch with a negated step — ClickHouse
# sequenceMatch('(?1)(?2)')(ts, view, purchase) tells you the order
# exists; real funnels also ask "…and nothing went wrong in between".
# The funnel fold (events_window_funnel) can't express negation; this
# state machine can.


@register(
    "events_sequence_match",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS tv FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS tp
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > v.tv
        GROUP BY e.user_id
    ),
    blocked AS (
        SELECT DISTINCT e.user_id
        FROM events e JOIN v USING (user_id) JOIN p USING (user_id)
        WHERE e.event_type = 'error' AND e.ts > v.tv AND e.ts < p.tp
    ),
    per_user AS (
        SELECT u.user_id,
               CASE WHEN b.user_id IS NOT NULL THEN 'blocked'
                    WHEN p.user_id IS NOT NULL THEN 'matched'
                    WHEN v.user_id IS NOT NULL THEN 'view_only'
                    ELSE 'no_view' END AS outcome
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN v ON u.user_id = v.user_id
        LEFT JOIN p ON u.user_id = p.user_id
        LEFT JOIN blocked b ON u.user_id = b.user_id
    )
    SELECT outcome, count(*) AS n_users FROM per_user GROUP BY outcome
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern with negation: per user, did the FIRST view
    lead to a purchase with NO error strictly between them? Outcomes:
    matched / blocked (an error intervened) / view_only / no_view.

    Spark plan: one shuffle collects each user's (ts, type) pairs,
    array_sort orders in-row, and a HOF fold walks the sequence with
    state (tv, tp, err) — the greedy scan IS the staged-min semantics
    the oracle states as three CTE hops. State is three scalars
    regardless of pattern length; negation is one extra transition,
    where the join-chain form needs a whole anti-join. Timestamps are
    microsecond-distinct in this corpus, so strict-> ties cannot
    diverge between the fold's sequence order and the oracle's ts
    comparisons."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("double").alias("t"),
        F.col("event_type").alias("et"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "et"))).alias("evs")
    )
    outcome = F.expr(
        """
        aggregate(
          evs,
          named_struct('tv', CAST(NULL AS DOUBLE), 'tp', CAST(NULL AS DOUBLE),
                       'err', false),
          (st, e) -> CASE
             WHEN st.tv IS NULL AND e.et = 'view'
               THEN named_struct('tv', e.t, 'tp', st.tp, 'err', st.err)
             WHEN st.tv IS NOT NULL AND st.tp IS NULL AND e.et = 'error' AND e.t > st.tv
               THEN named_struct('tv', st.tv, 'tp', st.tp, 'err', true)
             WHEN st.tv IS NOT NULL AND st.tp IS NULL AND e.et = 'purchase' AND e.t > st.tv
               THEN named_struct('tv', st.tv, 'tp', e.t, 'err', st.err)
             ELSE st
          END,
          st -> CASE
             WHEN st.tp IS NOT NULL AND st.err THEN 'blocked'
             WHEN st.tp IS NOT NULL THEN 'matched'
             WHEN st.tv IS NOT NULL THEN 'view_only'
             ELSE 'no_view'
          END)
        """
    )
    return (
        per_user.select(outcome.alias("outcome"))
        .groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# ORC roundtrip — the second columnar format Spark ships natively.
# Distinct failure surface from the text roundtrips: ORC has its own
# type mappings (TIMESTAMP, DECIMAL) and its own predicate-pushdown
# reader.


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(sum(l_quantity) AS BIGINT) AS qty_total,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           max(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + re-source: write lineitem as ORC (Spark-native
    columnar writer, zlib default), read it back, aggregate. The
    oracle aggregates the ORIGINAL parquet — any type-mapping loss in
    the ORC writer/reader (dates, decimals, nanos) breaks the hash.
    Executors write/read their partitions independently; both
    directions are full-width parallel, same as the parquet path."""
    import shutil
    import uuid

    from pg2ch_spark.streaming.runner import scratch_dir

    li = catalog.load(spark, sf_dir, "lineitem")
    base = scratch_dir("pg2ch_orc_")
    out = base + "/" + uuid.uuid4().hex[:8]
    li.write.mode("overwrite").orc(out)
    back = spark.read.schema(li.schema).orc(out)
    res = (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("bigint").alias("qty_total"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.max("l_shipdate").alias("last_ship"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return res


# ---------------------------------------------------------------------------
# Benchmark decontamination — cross-set n-gram CONTAINMENT. Near-dedup
# (minhash/simhash/jaccard) asks "are these two documents similar?";
# decontamination asks "does this training document contain any exact
# n-gram from the held-out benchmark?" — a different predicate (one
# shared shingle suffices) and an asymmetric pair of sets.

_DECON_N = 8  # word n-gram width, per the published 8-13-gram practice


def _word_ngrams(col: str, n: int) -> F.Column:
    """Distinct word n-grams of a text column, as an array of strings.

    Short documents must yield an EMPTY array. greatest(0, hi) is NOT a
    valid guard — Spark's sequence(1, 0) DESCENDS to [1, 0], and the
    i=0 step then crashes slice() (found by the random-docs
    differential corpus; the sf fixtures have no short docs). The only
    safe form is a conditional around the whole expression."""
    words = F.split(F.col(col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "text_decontaminate",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, string_split(text, ' ') AS words FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               array_to_string(words[i : i + {_DECON_N} - 1], ' ') AS gram
        FROM w, unnest(range(1, greatest(len(words) - {_DECON_N - 1}, 0) + 1)) AS r(i)
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
    corpus AS (SELECT DISTINCT doc_id, gram FROM grams WHERE source <> 'src0')
    SELECT c.doc_id, count(*) AS n_shared_grams
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep: flag every training document (source <>
    'src0') sharing at least one exact word-8-gram with the benchmark
    set (source = 'src0'); report how many distinct benchmark grams it
    contains. At 100 TB the shape holds: both sides explode to
    (gram, id) pairs, the join key is the gram string (hashable,
    shuffle-balanced — no skew because grams are near-unique), and the
    benchmark side of a real run is small enough to broadcast. No
    all-pairs comparison ever forms.

    Exact-dup collapsed (round 5): the shared-gram count is a pure
    function of the text, so the gram explode + join runs once per
    DISTINCT training text and the counts map back to members through
    an md5-key join — a duplicate-dense corpus pays the gram join once
    per distinct text instead of once per copy (100× replication probe:
    15.7× → post-collapse re-measure below). Per-doc gram distinctness
    is already in-row (array_distinct before the explode), so no
    post-explode distinct shuffle exists on the training side."""
    docs = catalog.load(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("source") == "src0")
        .select("text")
        .distinct()
        .select(F.explode(_word_ngrams("text", _DECON_N)).alias("gram"))
        .distinct()
    )
    train = docs.filter(F.col("source") != "src0").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("th"), "text"
    )
    texts = train.select("th", "text").dropDuplicates(["th"])
    per_text = (
        texts.select("th", F.explode(_word_ngrams("text", _DECON_N)).alias("gram"))
        .join(bench, "gram")
        .groupBy("th")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        train.select("doc_id", "th")
        .join(per_text, "th")
        .select("doc_id", "n_shared_grams")
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketches — ClickHouse uniqState/uniqMerge parity: the
# property that matters at 100 TB is not the estimate itself (Spark has
# approx_count_distinct) but that per-shard sketch STATES union
# losslessly, so rollups never rescan raw data.


@register("agg_hll_sketch_merge")  # estimate-valued: no exact SQL oracle by design
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL sketches of the user set, then a GLOBAL
    distinct-user estimate computed by UNIONING THE SKETCHES — never
    re-reading events (uniqState per part, uniqMerge at rollup). One
    pass over the data builds all per-type states; the union is a
    12KB-per-sketch reduce. The precision test
    (tests/test_edge_inputs.py) pins both estimates within 5% of
    exact, which is the datasketches HLL guarantee at lgK=12."""
    ev = catalog.load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    estimates = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
        F.lit(1).cast("bigint").alias("n_sketches"),
    )
    return estimates.unionByName(
        merged.select(F.lit("ALL").alias("event_type"), "approx_users", "n_sketches")
    )


@register(
    "agg_hll_sketch_bounds",
    oracle="""
    WITH per_type AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type
    ), all_row AS (
        SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events
    ), u AS (
        SELECT * FROM per_type UNION ALL SELECT * FROM all_row
    )
    SELECT event_type,
           exact_users,
           CAST(floor(0.95 * exact_users) AS BIGINT) AS lo_bound,
           CAST(ceil(1.05 * exact_users) AS BIGINT) AS hi_bound,
           TRUE AS est_in_bounds
    FROM u
    """,
)
def agg_hll_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Machine-checkable accuracy certificate for `agg_hll_sketch_merge`
    (which is rows-only by design: HLL binary registers differ across
    engines). Instead of emitting the estimate, this emits the EXACT
    per-type (and merged-ALL) distinct-user count plus a boolean that
    the Spark datasketches-HLL estimate — per-type sketch AND the
    sketch-union rollup — lands inside ±5% of exact. DuckDB's oracle
    computes the same exact counts and asserts literal TRUE, so a
    drifting sketch breaks the hash gate. Deterministic: datasketches
    HLL is a pure function of the value set; the default lgK=12 gives
    1.04/sqrt(4096) ≈ 1.6% rms, so 5% ≈ 3σ. Scale: one pass builds all
    sketch states map-side; exact counts shuffle only (type, user_id)
    pairs — both linear, no payload movement."""
    from pg2ch_spark.caching import eager_persist

    ev = catalog.load(spark, sf_dir, "events")
    # One pass over events: the distinct (type, user) pair table feeds
    # every branch below (HLL is duplicate-insensitive, so sketches
    # over the pairs equal sketches over raw events). Without the
    # persist each branch re-aggregates the scan — Spark has no
    # cross-branch subtree reuse (caching.py rationale).
    du = eager_persist(ev.select("event_type", "user_id").distinct())
    per_type = du.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count(F.lit(1)).alias("exact_users"),  # pairs are distinct
    )
    all_row = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
    ).crossJoin(
        du.agg(F.countDistinct("user_id").alias("exact_users"))
    ).select(F.lit("ALL").alias("event_type"), "exact_users", "est")
    typed = per_type.select(
        "event_type",
        "exact_users",
        F.hll_sketch_estimate("sketch").alias("est"),
    )
    lo = F.floor(F.lit(0.95) * F.col("exact_users")).cast("long")
    hi = F.ceil(F.lit(1.05) * F.col("exact_users")).cast("long")
    return typed.unionByName(all_row).select(
        "event_type",
        "exact_users",
        lo.alias("lo_bound"),
        hi.alias("hi_bound"),
        F.col("est").between(lo, hi).alias("est_in_bounds"),
    )


# ---------------------------------------------------------------------------
# Skew-mitigation JOIN — the join-side sibling of agg_salted_skew. At
# 100 TB the pattern applies when BOTH sides are too big to broadcast
# and one join key dominates; the probe forces the shuffle path on the
# fixture (broadcast off) to prove value-identity of the rewrite.

_JOIN_SALT = 16


@register(
    "join_salted_skew",
    oracle="""
    WITH dim(flag, weight, category) AS (
        VALUES ('A', 0.5, 'returned'), ('N', 1.0, 'normal'), ('R', 0.8, 'refused')
    )
    SELECT d.category,
           count(*) AS n,
           round(sum(CAST(l.l_extendedprice * d.weight AS DECIMAL(18,6))), 2)
               AS weighted_total
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
    GROUP BY d.category
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join over a pathologically skewed key:
    `l_returnflag` has 3 values across the whole table, so a plain
    shuffle join sends ~half of 100 TB through 3 reducer tasks. The
    rewrite replicates the dim side x16 (explode over a salt sequence)
    and tags the fact side with `pmod(l_orderkey, 16)` — deterministic,
    no rand() — so the join key (flag, salt) fans each hot key across
    16 evenly-sized tasks. Value-identical to the plain join (the
    oracle), proving the rewrite is semantics-preserving.

    On a 3-row dim you would broadcast instead (join_broadcast covers
    that); salting is for big-x-big skew, and AQE's skew-join split
    only kicks in when runtime stats see the skew — salting is the
    planned form. Broadcast is disabled inside the probe to force the
    shuffle plan (restored after)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # materialize under the forced-shuffle conf
        res = _salted_join(spark, li).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return res


def _salted_join(spark: SparkSession, li: DataFrame) -> DataFrame:
    """The salted-join plan itself (pre-materialization, plan-testable)."""
    dim = spark.createDataFrame(
        [("A", 0.5, "returned"), ("N", 1.0, "normal"), ("R", 0.8, "refused")],
        "flag string, weight double, category string",
    )
    salted_dim = dim.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_JOIN_SALT - 1))).alias("_salt")
    )
    fact = li.select(
        F.col("l_returnflag").alias("flag"),
        "l_extendedprice",
        F.pmod(F.col("l_orderkey"), F.lit(_JOIN_SALT)).cast("int").alias("_salt"),
    )
    return (
        fact.join(salted_dim, ["flag", "_salt"])
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal-mediated sum: the per-row double product is
            # IEEE-identical in both engines, but a double SUM depends
            # on partition order — across 16 salt tasks it lands on
            # round-2 boundaries (seen at sf0.001). Summing the exact
            # decimal image of each product is order-independent.
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("weight")).cast("decimal(18,6)")),
                2,
            ).cast("double").alias("weighted_total"),
        )
    )


# ---------------------------------------------------------------------------
# Near-dup CLUSTERING — pairs are not the end of a dedup pipeline: the
# keep-one-per-group step needs connected components over the pair
# graph (A~B, B~C => {A,B,C} is one cluster even though A,C never met).


@register(
    "dedup_cluster_components",
    oracle=None,  # set below: needs the shingle CTEs from llm.neardup
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact-Jaccard near-dup graph
    (edges: word-3-gram Jaccard >= 0.5, same predicate as
    text_near_dedup_ngram_jaccard), then per-cluster dedup stats:
    cluster_id = min doc_id in the component, member count, member
    span. This is the step that turns near-dup PAIRS into dedup
    GROUPS.

    Spark plan: min-label propagation to fixpoint — labels start as
    each doc's own id; each round every doc takes the min label over
    itself and its neighbors (one join + one groupBy per round,
    localCheckpoint to cut lineage); converges in <= diameter rounds
    (fixture graphs are tiny chains; web-scale dedup graphs have
    diameter ~log n, and the same loop is how large-star/small-star
    rounds are built). The driver-side loop orchestrates ROUNDS, not
    rows — each iteration is a full distributed job, and the stop
    check is a 1-row count.

    The oracle states the SAME fixpoint as a recursive transitive
    closure (min over reachable set), which is exact on the fixture
    scale."""
    from pg2ch_spark.llm.neardup import _JACCARD_MIN, _rep_pair_scores

    docs = catalog.load(spark, sf_dir, "documents")
    # Exact duplicates collapse to a representative BEFORE pair
    # generation: identical texts are trivially near-dups of each other
    # (Jaccard 1), so enumerating their O(copies²) pairs adds nothing
    # to the components — but it's what makes naive near-dup quadratic
    # on real corpora, where popular documents repeat thousands of
    # times (10x scale probe: 13x cost before this, ~linear after).
    # Identity edges (doc ↔ its representative) preserve membership.
    # Only (doc_id, rep) id pairs are shuffled and checkpointed — the
    # text column never leaves the scan except into the shingle split
    # (at 100 TB, checkpointing or window-shuffling the text corpus is
    # the difference between an id-sized and a corpus-sized state).
    h = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("th"))
    rep_map = h.groupBy("th").agg(F.min("doc_id").alias("rep"))
    mem = h.join(rep_map, "th").select("doc_id", "rep").localCheckpoint(eager=True)
    reps = docs.join(
        mem.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    ident = mem.where(F.col("doc_id") != F.col("rep")).select(
        F.col("doc_id").alias("doc_a"), F.col("rep").alias("doc_b")
    )
    # rep-level scored pairs directly (skips the no-op re-collapse and
    # the member-product expansion of the pair-contract entry points)
    rep_pairs, _ = _rep_pair_scores(
        reps, lambda cont, jac: jac >= _JACCARD_MIN, ("jaccard", _JACCARD_MIN)
    )
    pairs = rep_pairs.select("doc_a", "doc_b").unionByName(ident)
    # r9 (VERDICT item 4): hash-partition edges on the loop's join key
    # ONCE, before the checkpoint. Measured mechanism (paired 3-variant
    # probe, scripts/dedup_loop_probe.py, plans in plans/r09): under
    # AQE the checkpointed RDD reports UnknownPartitioning, so the
    # per-round edges-side Exchange is NOT planned away — the win is
    # PARTITION BALANCE: without the repartition the loop inherits the
    # pair pipeline's skewed output partitions and every round pays a
    # straggler (10x-unique probe: full fixpoint 6.4-15.3 s plain vs
    # 1.93-1.99 s repartitioned, 3.3x; sf0.1 0.94 vs 0.82 s). The
    # exchange-ELIMINATING variant (repartition + sortWithinPartitions
    # + columnar eager_persist — InMemoryRelation does keep
    # partitioning+ordering, its round plan has no edges-side Exchange
    # or Sort) measured 3.4-4.3 s at 10xu: the per-round columnar
    # decode of the edge cache costs more than the exchange it saves,
    # so it was rejected on evidence.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .repartition(n_shuffle, "doc_b")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc"))
        .distinct()
        .select("doc", F.col("doc").alias("label"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    for _ in range(20):  # >= any fixture diameter; loop exits at fixpoint
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc)
            .groupBy(edges.doc_a.alias("doc"))
            .agg(F.min("label").alias("nlabel"))
        )
        # The changed-count rides the checkpoint job itself via
        # observe() (r8): the eager localCheckpoint is the round's one
        # action, and the observation aggregates `chg` as the rows
        # stream through it — no second stop-probe job per round (the
        # previous limit(1).count() was a full scan of the label table
        # per round at scale).
        obs = Observation()
        new_labels = (
            labels.join(neighbor_min, "doc", "left")
            .select(
                "doc",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label")).alias("chg"),
            )
            .observe(obs, F.sum(F.col("chg").cast("long")).alias("n_chg"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels.drop("chg")
        if not (obs.get["n_chg"] or 0):
            break
    return labels.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("doc").alias("doc_max"),
    )


# The cluster oracle composes the shingle/pair CTEs from llm.neardup
# (SAME edge predicate as the Spark side, by construction) with a
# recursive transitive closure; assigned directly because the SQL is
# built from another module's constants.
def _cluster_oracle() -> str:
    from pg2ch_spark.llm.neardup import _JACCARD_MIN, _SHINGLE_SQL

    return f"""
    WITH RECURSIVE {_SHINGLE_SQL.strip()},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE CAST(ni AS DOUBLE) / (x.n + y.n - ni) >= {_JACCARD_MIN}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS doc FROM edges),
    reach(doc, r) AS (
        SELECT doc, doc FROM verts
        UNION
        SELECT reach.doc, e.b FROM reach JOIN edges e ON reach.r = e.a
    ),
    lab AS (SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc)
    SELECT cluster_id, count(*) AS n_docs, max(doc) AS doc_max
    FROM lab GROUP BY cluster_id
    """


registry.ORACLES["dedup_cluster_components"] = textwrap.dedent(_cluster_oracle()).strip()


# ---------------------------------------------------------------------------
# Composed TPC-H showcases — multi-join + filter + top-k shapes a pg2ch
# user runs against the replicated warehouse daily. Q1's agg shape and
# Q5's star shape are covered (agg_groupby_q1, join_multiway_star);
# Q3 adds filtered-join + group + global top-k, Q18 adds a HAVING
# semi-filter feeding a join.


@register(
    "query_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def query_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): revenue of unshipped BUILDING
    orders as of the cutoff, top-10. The segment filter prunes
    customer BEFORE the join (Catalyst pushes it into the scan), the
    date filters prune both fact scans, and the global top-10 is
    TakeOrderedAndProject over the grouped partials — never a full
    sort. Tie-break on (o_orderdate, l_orderkey) for a total order."""
    c = catalog.load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = "1997-06-30"
    o = catalog.load(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = catalog.load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q18_QTY = 300


@register(
    "query_tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big ON big.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
)
def query_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds the threshold, with their customers, top-100 by price.
    The HAVING pre-aggregate runs ONCE over lineitem (map-side
    partials on the natural key), and its tiny result semi-filters the
    join via a broadcast — the anti-pattern would be joining the full
    fact to itself. Total order via (o_totalprice, date, orderkey)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > _Q18_QTY)
        .select("l_orderkey")
    )
    c = catalog.load(spark, sf_dir, "customer")
    o = catalog.load(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Regression aggregates — CH simpleLinearRegression / standard SQL
# regr_* family; one streaming-moment pass per group, no sort.


@register(
    "agg_regr_linfit",
    oracle="""
    WITH pts AS (
        -- whole-second x, matching Spark's CAST(ts AS LONG): events.ts
        -- is nanosecond parquet, and epoch() keeps the fraction DuckDB-
        -- side while Spark truncates — the x grids must be identical
        -- or the fitted slope drifts past the rounding guard
        SELECT event_type, value,
               CAST(floor(epoch(ts)) AS BIGINT) / 3600.0 AS x
        FROM events
    )
    SELECT event_type,
           round(regr_slope(value, x), 6) AS slope,
           round(regr_intercept(value, x), 4) AS intercept,
           round(regr_r2(value, x), 6) AS r2,
           CAST(regr_count(value, x) AS BIGINT) AS n
    FROM pts GROUP BY event_type
    """,
)
def agg_regr_linfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares fit of event value over time (hours):
    slope, intercept, R², n. regr_* aggregates are single-pass moment
    accumulators (sum, sum x, sum x², sum xy) with map-side partials —
    the shuffle carries 5 doubles per group per partition regardless
    of row count. Both engines compute identical closed forms in
    double; outputs rounded where the magnitudes make 1-ulp drift
    possible. x is whole-second epoch (TIMESTAMP_NTZ casts to LONG but
    not DOUBLE in Spark 4, and the ns-parquet fraction must not leak
    into one engine's x grid only — SURVEY §2.5 D3)."""
    ev = catalog.load(spark, sf_dir, "events")
    x = F.col("ts").cast("long") / 3600.0
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope("value", x), 6).alias("slope"),
        F.round(F.regr_intercept("value", x), 4).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
        F.regr_count("value", x).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram — two-phase: global bounds first (1-row
# broadcast), then bin counts. The data-dependent-bounds form of CH
# histogram(); exact because the binning rule is stated, not adaptive.

_HIST_BINS = 10


@register(
    "events_histogram_fixed",
    oracle=f"""
    WITH bounds AS (
        SELECT min(value) AS lo, max(value) AS hi FROM events
    )
    SELECT event_type,
           CAST(least(floor((value - lo) / ((hi - lo) / {_HIST_BINS})),
                      {_HIST_BINS - 1}) AS BIGINT) AS bin,
           count(*) AS n
    FROM events, bounds
    GROUP BY 1, 2
    """,
)
def events_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bin fixed-width histogram of event value per type, bounds
    from the data: pass 1 computes global (min, max) — one 2-double
    row, broadcast into pass 2's bin expression via crossJoin — pass 2
    is a map-side-partial count on (type, bin). At 100 TB both passes
    are single scans; the max value lands in the last bin by the
    stated least() rule, so the binning is exact, not
    engine-adaptive."""
    ev = catalog.load(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / _HIST_BINS
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width),
                F.lit(_HIST_BINS - 1),
            )
            .cast("bigint")
            .alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Round-3 additions: anomaly scoring and cast-edge semantics.


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               avg(value) AS mu,
               stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) FILTER (WHERE abs((e.value - s.mu) / s.sigma) > 2.5)
               AS n_outliers,
           count(*) AS n,
           round(max(abs((e.value - s.mu) / s.sigma)), 4) AS max_z
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly counts (|z| > 2.5) plus the max score —
    the monitoring query every event pipeline runs. Two passes over
    events, both map-side-partial aggregations; the per-type (mu,
    sigma) table is 5 rows and broadcasts onto the second scan. At
    100 TB the stats pass and score pass each read the column once —
    the single-pass alternative (window over the full partition)
    would sort every partition for no reason."""
    ev = catalog.load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    # try_divide: a constant-valued group has sigma 0, which Spark 4's
    # ANSI mode turns into a job-killing DIVIDE_BY_ZERO; the oracle's
    # /0 is NULL (no outliers, NULL max_z) — degrade identically
    z = F.abs(F.try_divide(F.col("value") - F.col("mu"), F.col("sigma")))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.when(z > 2.5, 1)).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.max(z), 4).alias("max_z"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_cast_edge",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_brand AS INTEGER)                       AS brand_as_int,
           TRY_CAST(substring(p_brand, 7) AS INTEGER)         AS brand_num,
           CAST(floor(p_retailprice) AS BIGINT)               AS price_floor,
           CAST(CAST(p_retailprice AS DECIMAL(12, 2)) AS VARCHAR) AS price_str,
           TRY_CAST('not a number' AS DOUBLE)                 AS always_null
    FROM part WHERE p_partkey < 200
    """,
)
def fn_cast_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast-edge semantics (CH accurateCastOrNull / toInt32OrNull
    parity): failing string→int casts must yield NULL, not errors —
    under ANSI mode that is try_cast, NOT cast (a plain cast would
    kill a 100 TB job on one malformed row). Numeric→string goes
    through DECIMAL(12,2) in BOTH engines so the text form is
    identical ('123.45', no float repr noise)."""
    p = catalog.load(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.expr("try_cast(p_brand AS int)").alias("brand_as_int"),
        F.expr("try_cast(substring(p_brand, 7) AS int)").alias("brand_num"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("string").alias("price_str"),
        F.expr("try_cast('not a number' AS double)").alias("always_null"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketches — the quantile counterpart of
# agg_hll_sketch_merge: per-shard states must UNION losslessly so
# rollups never rescan raw data (CH quantileState/quantileMerge).

_QH_BINS = 32


@register(
    "agg_quantile_histogram_merge",
    oracle=f"""
    WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    binned AS (
        SELECT event_type,
               CAST(least(floor((value - b.lo) / (b.hi - b.lo) * {_QH_BINS}),
                          {_QH_BINS - 1}) AS INTEGER) AS bin
        FROM events, b
    ),
    per_type AS (
        SELECT event_type, bin, count(*) AS c FROM binned GROUP BY 1, 2
    ),
    merged AS (
        SELECT bin, sum(c) AS c FROM per_type GROUP BY bin
    ),
    cum AS (
        SELECT bin, c,
               sum(c) OVER (ORDER BY bin) AS cum,
               sum(c) OVER () AS total
        FROM merged
    )
    SELECT
        (SELECT min(bin) FROM cum WHERE cum >= 0.5 * total) AS p50_bin,
        (SELECT min(bin) FROM cum WHERE cum >= 0.9 * total) AS p90_bin,
        round((SELECT b.lo + (CAST((SELECT min(bin) FROM cum
                                    WHERE cum >= 0.5 * total) AS DOUBLE) + 1)
                      / {_QH_BINS} * (b.hi - b.lo) FROM b), 4) AS p50_est,
        round((SELECT b.lo + (CAST((SELECT min(bin) FROM cum
                                    WHERE cum >= 0.9 * total) AS DOUBLE) + 1)
                      / {_QH_BINS} * (b.hi - b.lo) FROM b), 4) AS p90_est
    """,
)
def agg_quantile_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: per-type {bins}-bin histogram STATES
    (built in one pass, map-side partials) merge by bin-count addition
    into a global histogram — the raw column is never rescanned for
    the rollup — and quantiles come off the merged state by cumulative
    interpolation at the bin's upper edge. The binning rule is stated
    (fixed-width from global bounds, integer arithmetic), so unlike a
    t-digest the whole pipeline is deterministic and exact-checkable.
    Accuracy is the histogram guarantee: ±(hi−lo)/{bins}. At 100 TB
    per-shard states are {bins} longs — the rollup shuffles KBs."""
    ev = catalog.load(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * _QH_BINS),
            F.lit(_QH_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
    )
    per_type = binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    merged = per_type.groupBy("bin").agg(F.sum("c").alias("c"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bin", F.sum("c").over(wcum).alias("cum"), F.sum("c").over(Window.orderBy(F.lit(1)).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("total")
    )
    p50 = cum.where(F.col("cum") >= 0.5 * F.col("total")).agg(F.min("bin").alias("p50_bin"))
    p90 = cum.where(F.col("cum") >= 0.9 * F.col("total")).agg(F.min("bin").alias("p90_bin"))
    est = (
        p50.crossJoin(p90)
        .crossJoin(F.broadcast(b))
        .select(
            "p50_bin",
            "p90_bin",
            F.round(
                F.col("lo")
                + (F.col("p50_bin").cast("double") + 1) / _QH_BINS * (F.col("hi") - F.col("lo")),
                4,
            ).alias("p50_est"),
            F.round(
                F.col("lo")
                + (F.col("p90_bin").cast("double") + 1) / _QH_BINS * (F.col("hi") - F.col("lo")),
                4,
            ).alias("p90_est"),
        )
    )
    return est


@register(
    "agg_summap",
    oracle="""
    WITH per AS (
        SELECT o.o_orderpriority, l.l_returnflag,
               CAST(CAST(sum(l.l_quantity) AS DECIMAL(18, 2)) AS VARCHAR) AS q
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           string_agg(l_returnflag || ':' || q, '|' ORDER BY l_returnflag)
               AS qty_map
    FROM per GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_summap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` parity: per order priority, the map
    returnflag → total quantity, aggregated element-wise across rows.
    Spark's shape is groupBy(outer key, map key) + re-aggregate into
    sorted entries — two narrow shuffles of scalar partials, never a
    map-valued accumulation (merging per-row maps in an aggregate
    buffer would serialize/deserialize maps per row). Emitted as a
    canonical sorted 'k:v|k:v' string through DECIMAL so both engines
    print identical numerics."""
    o = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    per = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.sum("l_quantity").cast("decimal(18,2)").cast("string").alias("q")
        )
    )
    entry = F.concat_ws(":", "l_returnflag", "q")
    return (
        per.groupBy("o_orderpriority")
        .agg(
            F.array_join(F.array_sort(F.collect_list(entry)), "|").alias("qty_map")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, count(*) AS n FROM seq
        WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           round(n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE), 4) AS p
    FROM pairs
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-journey transition matrix: per (current, next)
    event-type pair, the transition count and conditional probability
    P(next | current) over per-user (ts, event_id)-ordered sequences —
    the Markov-chain summary behind funnel diagnostics and synthetic
    session generation.

    One shuffle by user_id for the lead() window; the pair counts
    partial-aggregate map-side down to ≤|types|² rows, and the
    per-current normalization windows over that tiny aggregate (25
    rows here; |types|² anywhere), never the event stream. At 100 TB
    the plan is the sessionize shape: events shuffle once on the
    uniform user key, everything after is constant-size.
    """
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    w_cur = Window.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_cur).cast("double"), 4).alias("p"),
    )


_TOP_PATHS_K = 20


@register(
    "events_top_paths",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                         > {_SESSION_GAP_S}
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, sid
    ), counted AS (
        SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
    )
    SELECT path, n_sessions FROM counted
    QUALIFY row_number() OVER (ORDER BY n_sessions DESC, path) <= {_TOP_PATHS_K}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} session journey paths: sessions (same 30-min idle rule
    as `events_sessionize`) rendered as ordered 'type>type>…' strings,
    counted corpus-wide — the "most common user journeys" query CH
    answers with groupArray + arrayStringConcat.

    The session windows reuse ONE HashPartitioning(user_id) exchange
    (the sessionize shape); each session's path materializes as a
    sorted array bounded by the session length (the gap rule bounds it
    in wall-time, not corpus size). Path counts partial-aggregate
    map-side — duplicate journeys collapse before the shuffle — and
    the global top-k is TakeOrderedAndProject. Tie-break on the path
    string keeps the result total-ordered."""
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > _SESSION_GAP_S), 1).otherwise(0).alias("new_s"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    paths = sessions.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return counted.orderBy(F.col("n_sessions").desc(), "path").limit(_TOP_PATHS_K)


@register(
    "events_abtest_lift",
    oracle="""
    WITH m AS (
        SELECT event_type,
               count(*) FILTER (user_id % 2 = 0) AS n_c,
               count(*) FILTER (user_id % 2 = 1) AS n_t,
               avg(value) FILTER (user_id % 2 = 0) AS mu_c,
               avg(value) FILTER (user_id % 2 = 1) AS mu_t,
               avg(value * value) FILTER (user_id % 2 = 0) AS m2_c,
               avg(value * value) FILTER (user_id % 2 = 1) AS m2_t
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_c, n_t,
           round(mu_t - mu_c, 4) AS lift,
           round((mu_t - mu_c) /
                 sqrt((m2_c - mu_c * mu_c) / n_c + (m2_t - mu_t * mu_t) / n_t),
                 4) AS z_stat
    FROM m
    """,
)
def events_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B lift per event type: users split deterministically into
    control/treatment by user_id parity; report group sizes, mean lift,
    and the two-sample z statistic (Welch denominator from single-pass
    E[x²]−E[x]² variances) — the experiment-readout query every
    product-analytics deployment runs.

    ONE aggregation: both variants' counts and first/second moments are
    conditional aggregates over the same (event_type) groupBy — no
    pivot, no self-join, map-side partials carry 6 doubles per group.
    The z denominator uses identical closed forms on both engines, so
    rounding at 4dp is engine-stable (the `events_anomaly_zscore`
    precedent)."""
    ev = catalog.load(spark, sf_dir, "events")
    is_c = F.col("user_id") % 2 == 0
    is_t = F.col("user_id") % 2 == 1
    m = ev.groupBy("event_type").agg(
        F.count(F.when(is_c, 1)).alias("n_c"),
        F.count(F.when(is_t, 1)).alias("n_t"),
        F.avg(F.when(is_c, F.col("value"))).alias("mu_c"),
        F.avg(F.when(is_t, F.col("value"))).alias("mu_t"),
        F.avg(F.when(is_c, F.col("value") * F.col("value"))).alias("m2_c"),
        F.avg(F.when(is_t, F.col("value") * F.col("value"))).alias("m2_t"),
    )
    lift = F.col("mu_t") - F.col("mu_c")
    # try_divide: both variants constant -> zero pooled variance ->
    # ANSI DIVIDE_BY_ZERO would abort the job; the oracle's /0 is NULL
    z = F.try_divide(
        lift,
        F.sqrt(
            (F.col("m2_c") - F.col("mu_c") * F.col("mu_c")) / F.col("n_c")
            + (F.col("m2_t") - F.col("mu_t") * F.col("mu_t")) / F.col("n_t")
        ),
    )
    return m.select(
        "event_type",
        "n_c",
        "n_t",
        F.round(lift, 4).alias("lift"),
        F.round(z, 4).alias("z_stat"),
    )
