"""Physical-plan assertions — the scale story, checked, not assumed.

These tests pin the plan shapes that matter at 100 TB: predicate
pushdown + column pruning into the parquet scan, broadcast joins for
small dims, and TakeOrderedAndProject for global top-k (no full sort).
"""

from __future__ import annotations

from pg2ch_spark import registry
from pg2ch_spark.plans import physical_plan, scan_columns
from tests.conftest import SF_T2

registry.load_all()


def _plan(spark, key: str) -> str:
    return physical_plan(registry.QUERIES[key](spark, SF_T2))


def test_scan_prunes_and_pushes_down(spark):
    plan = _plan(spark, "scan_pruned_pushdown")
    assert "FileScan parquet" in plan
    # only the referenced columns are read (16 in the table)
    cols = scan_columns(registry.QUERIES["scan_pruned_pushdown"](spark, SF_T2))
    assert "l_shipdate" in cols and "l_extendedprice" not in cols and len(cols) <= 4
    assert "PushedFilters" in plan or "DataFilters" in plan


def test_broadcast_join_is_broadcast(spark):
    plan = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "join_multiway_star")
    assert "BroadcastHashJoin" in plan


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(spark, "limit_topk_global")
    assert "TakeOrderedAndProject" in plan


def test_q1_has_partial_aggregation(spark):
    plan = _plan(spark, "agg_groupby_q1")
    # partial (map-side) + final hash aggregate
    assert plan.count("HashAggregate") >= 2

def test_simhash_candidates_avoid_nested_loop(spark):
    """Band-LSH candidate generation must be equi-joins (shuffle- or
    broadcast-hash), never a BroadcastNestedLoopJoin — an OR-join over
    band values would be O(n²) at corpus scale."""
    plan = _plan(spark, "text_near_dedup_simhash")
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_assignment_is_broadcast(spark):
    """Centroid assignment must broadcast the tiny centroid table."""
    plan = _plan(spark, "sim_ann_ivf")
    assert "BroadcastHashJoin" in plan


def test_lang_id_profile_is_broadcast(spark):
    """The 5×40-bigram profile must broadcast against the gram stream."""
    plan = _plan(spark, "text_lang_id")
    assert "BroadcastHashJoin" in plan


def test_quality_score_has_no_shuffle(spark):
    """Per-document scoring is a map-only pipeline — any Exchange means
    an accidental shuffle crept in."""
    plan = _plan(spark, "text_quality_score")
    assert "Exchange" not in plan


def test_near_dup_embedding_is_arrow_batched(spark):
    """The block-pair kernel runs in applyInPandas (Arrow grouped map),
    with the threshold filter applied after it (never pushed into a
    join)."""
    plan = _plan(spark, "sim_near_dup_embedding")
    assert "FlatMapGroupsInPandas" in plan or "applyinpandas" in plan.lower()


def test_near_dup_embedding_never_touches_the_driver(spark, monkeypatch):
    """Building the query must not materialize anything on the driver —
    no toPandas/collect (a driver OOM at billions of vectors) and no
    sparkContext.broadcast of table data."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):  # pragma: no cover - should never fire
        raise AssertionError("driver-side materialization in query construction")

    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(
        type(spark.sparkContext), "broadcast", _boom, raising=True
    )
    df = registry.QUERIES["sim_near_dup_embedding"](spark, SF_T2)
    assert df is not None  # plan constructed lazily, driver untouched


def test_framesample_prunes_payload_scan(spark):
    """Frame sampling reads only doc_id + text from the documents scan
    (the metadata columns never reach the Arrow batches)."""
    cols = scan_columns(registry.QUERIES["multimodal_framesample"](spark, SF_T2))
    assert "text" in cols and "doc_id" in cols
    assert "source" not in cols and "lang" not in cols


def test_percentiles_single_buffered_pass(spark):
    """All three quantiles come from ONE percentile aggregate buffer
    (the three-separate-aggregates form triples the sort buffers)."""
    plan = _plan(spark, "agg_percentiles")
    assert plan.count("percentile") <= plan.count("HashAggregate") * 2  # sanity
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_versioned_collapsing_single_shuffle(spark):
    """The signed expansion must stay an in-row explode so the lag
    window's key partitioning carries through the net agg and the
    per-key final agg: exactly ONE Exchange for the whole query (a
    union of filtered branches would discard it and re-shuffle)."""
    plan = _plan(spark, "cdc_versioned_collapsing")
    assert plan.count("Exchange") == 1, plan


def test_quantize_int8_has_no_shuffle(spark):
    """Per-vector quantization is pure map-side HOF work."""
    plan = _plan(spark, "embedding_quantize_int8")
    assert "Exchange" not in plan, plan


def test_pivot_is_two_phase_no_inference_job(spark):
    """Declared pivot values compile to a two-phase aggregate (pre-agg
    by (priority, status) then PivotFirst) — two narrow shuffles and no
    distinct-collect inference pass."""
    plan = _plan(spark, "agg_pivot")
    assert plan.count("Exchange") <= 2, plan
    assert "pivotfirst" in plan.lower(), plan


def test_stream_stream_join_state_is_evictable(spark):
    """Both join sides must carry watermarks and the join must keep an
    equi-conjunct on user_id: that pair is what bounds stream-stream
    join state (eviction) and keeps the join a hash join, not a
    nested-loop scan. Asserted on the streaming logical plan since the
    physical plan only exists per micro-batch."""
    import pyspark.sql.functions as F
    from pg2ch_spark import catalog
    from pg2ch_spark.streaming.queries import _events_schema
    from pg2ch_spark.streaming.runner import _stream_source

    path = catalog.table_path(SF_T2, "events")
    schema = _events_schema(spark, SF_T2)

    def side(event_type, alias):
        src = _stream_source(spark, path, schema)
        return (
            src.where(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user"),
                F.timestamp_seconds(catalog.ts_epoch_s(src)).alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "1 hour")
        )

    joined = side("signup", "s").join(
        side("purchase", "p"),
        F.expr("s_user = p_user AND p_ts > s_ts AND p_ts <= s_ts + interval 1 hour"),
    )
    logical = joined._jdf.queryExecution().analyzed().toString()
    assert logical.count("EventTimeWatermark") == 2, logical
    assert "(s_user" in logical and "= p_user" in logical, logical


def test_partitioned_scan_prunes_directories(spark, tmp_path):
    """The priority filter must be a PARTITION filter (directory
    elimination at plan time), not a per-row data filter."""
    from pg2ch_spark import catalog
    from pg2ch_spark.operators.extended import _partition_pruned_scan

    out = str(tmp_path / "orders_parted")
    catalog.load(spark, SF_T2, "orders").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(out)
    plan = physical_plan(_partition_pruned_scan(spark, out))
    assert "PartitionFilters" in plan, plan
    # the filter shows up inside PartitionFilters, with the pruned value
    pf = plan[plan.index("PartitionFilters") :].split("]", 1)[0]
    assert "1-URGENT" in pf, pf


def test_bucketed_join_has_no_join_exchange(spark):
    """Both sides bucketed 8 ways on the join key: the sort-merge join
    must consume bucket files directly — the ONLY Exchange in the plan
    is the post-join aggregation's (different key), never the join's."""
    from pg2ch_spark import catalog
    from pg2ch_spark.operators.extended import _bucketed_join
    from pg2ch_spark.streaming.runner import scratch_dir

    db = "pg2ch_bucket_db_test"
    loc = scratch_dir("pg2ch_bucketdb_test_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    catalog.load(spark, SF_T2, "orders").write.mode("overwrite").format(
        "parquet"
    ).bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(f"{db}.orders_b")
    catalog.load(spark, SF_T2, "customer").write.mode("overwrite").format(
        "parquet"
    ).bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(f"{db}.customer_b")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = physical_plan(_bucketed_join(spark, db))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP DATABASE {db} CASCADE")
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_sessionize_reuses_one_partitioning(spark):
    """lag-window, running-sum window, and the (user, session) rollup
    all hash-partition by user_id: HashPartitioning(user_id) satisfies
    ClusteredDistribution(user_id, session_id), so the whole query runs
    on ONE Exchange."""
    plan = _plan(spark, "events_sessionize")
    assert plan.count("Exchange") == 1, plan


def test_argmax_is_single_partial_aggregate(spark):
    """max_by/min_by compile to one hash aggregate with map-side
    partials: exactly one Exchange (on event_type), no window sort of
    the raw events (windowed row_number is the oracle's plan, not
    ours)."""
    plan = _plan(spark, "agg_argmax")
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan


def test_decontaminate_joins_on_grams_not_pairs(spark):
    """Containment check is a gram-key equi-join; an all-pairs doc
    comparison (nested-loop) must never form."""
    plan = _plan(spark, "text_decontaminate")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_salted_join_shuffles_on_flag_and_salt(spark):
    """With broadcast off (the big-x-big scenario the operator
    documents), the salted join must be a shuffle join keyed on
    (flag, _salt) — the salt fans each hot key over 16 tasks."""
    from pg2ch_spark import catalog
    from pg2ch_spark.operators.analytics import _salted_join

    li = catalog.load(spark, SF_T2, "lineitem")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = physical_plan(_salted_join(spark, li))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "_salt" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_tpch_q5_broadcasts_all_dims(spark):
    """Q5's supplier/nation/region attach without repartition
    exchanges; only the two fact joins shuffle."""
    plan = _plan(spark, "query_tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_tpch_q6_is_scan_plus_single_agg(spark):
    """Q6 must be filter + 1-row aggregate: no joins at all, predicates
    reaching the scan."""
    plan = _plan(spark, "query_tpch_q6")
    assert "Join" not in plan
    assert "PushedFilters" in plan or "DataFilters" in plan


def test_tpch_q10_topk_avoids_full_sort(spark):
    plan = _plan(spark, "query_tpch_q10")
    assert "TakeOrderedAndProject" in plan


def test_tpch_q17_single_fact_preaggregate(spark):
    """The de-correlated scalar subquery must appear as a broadcast
    join of a pre-aggregate, not a per-row recomputation (no nested
    loop) — and lineitem is scanned at most twice (outer + threshold),
    never per part."""
    plan = _plan(spark, "query_tpch_q17")
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FileScan parquet") <= 4


def test_tpch_q21_no_fact_self_join_explosion(spark):
    """Q21's EXISTS/NOT-EXISTS pair is de-correlated into window
    passes: no BroadcastNestedLoopJoin, no cartesian."""
    plan = _plan(spark, "query_tpch_q21")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_signals_zero_shuffle(spark):
    """Per-document repetition scoring is in-row HOF work — the plan
    may exchange only for the final orderBy, never for the signals."""
    plan = _plan(spark, "text_repetition_signals")
    # one Exchange allowed: the rangepartitioning for orderBy
    assert plan.count("Exchange hashpartitioning") == 0


def test_unpivot_reads_fact_once(spark):
    plan = _plan(spark, "corpus_unpivot")
    assert plan.count("FileScan parquet") == 1


def test_gap_fill_grid_is_broadcast(spark):
    """The bounds x types grid must attach via broadcast, and the
    dense grid generation must not shuffle the event corpus."""
    plan = _plan(spark, "events_gap_fill")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_heavy_hitters_candidates_broadcast_semi(spark):
    """The exact recount must semi-filter the token stream against the
    BROADCAST candidate set — a shuffled join would reintroduce the
    full-vocabulary shuffle the operator exists to avoid."""
    plan = _plan(spark, "text_vocab_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_q15_max_subquery_is_broadcast_not_recompute(spark):
    """The scalar-max attaches via a broadcast nested-loop of a 1-row
    aggregate; the revenue view must appear ONCE as a reused exchange
    or checkpoint, not as two full lineitem aggregations."""
    plan = _plan(spark, "query_tpch_q15")
    assert plan.count("FileScan parquet") <= 3, plan


def test_q9_profit_is_decimal_exact(spark):
    """Q9's aggregation buffer must be decimal, not double — the whole
    point of the operator's exactness story."""
    df = registry.QUERIES["query_tpch_q9"](spark, SF_T2)
    import pyspark.sql.functions as F  # noqa: F401
    # sum(decimal(18,4)) widens to decimal(28,4) before the final cast
    plan = physical_plan(df)
    assert "as decimal(18,4)" in plan.lower(), plan


def test_flagship_aggregates_scan_vectorized_with_pushdown(spark):
    """Q1/Q6-shaped hot paths must read parquet vectorized (Batched:
    true — the columnar path whole-stage codegen consumes) with every
    eligible predicate pushed into the scan, and aggregate in two
    phases (partial + final). The AQE pre-execution plan doesn't print
    codegen stage markers, so these are the checkable proxies."""
    for key in ("agg_groupby_q1", "query_tpch_q6"):
        plan = _plan(spark, key)
        assert "Batched: true" in plan, (key, plan)
        assert plan.count("HashAggregate") >= 2, (key, plan)
    assert "PushedFilters: [IsNotNull" in _plan(spark, "query_tpch_q6")


def test_summap_never_aggregates_map_values(spark):
    """agg_summap must aggregate scalars then assemble entries — no
    map-typed aggregate buffer (ObjectHashAggregate over maps)."""
    plan = _plan(spark, "agg_summap")
    assert "map_concat" not in plan.lower()
    assert plan.count("HashAggregate") >= 2, plan


def test_pack_sequences_prefix_sum_is_sharded_and_broadcast(spark):
    """The packing prefix sum must never window the raw corpus on the
    skewed source key: the corpus shuffles on (source, shard) only,
    the source-partitioned window runs on the tiny shard-totals side,
    and that side comes back via broadcast join."""
    import re

    plan = _plan(spark, "pipeline_pack_sequences")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # every window over the corpus partitions by (source, shard); the
    # source-only window exists exactly once (the shard-offset table)
    win_specs = re.findall(r"windowspecdefinition\(([^)]*?)\, [a-z_]+#\d+L? ASC", plan)
    source_only = [w for w in win_specs if "shard" not in w]
    assert len(source_only) == 1, win_specs
    cols = scan_columns(registry.QUERIES["pipeline_pack_sequences"](spark, SF_T2))
    assert cols <= {"doc_id", "text", "source"} if isinstance(cols, set) else True


def test_bpe_merge_candidates_partial_agg_then_topk(spark):
    """The bigram count must partially aggregate map-side (the Zipf
    head collapses before the shuffle) and the global top-k must be
    TakeOrderedAndProject, never a full sort."""
    plan = _plan(spark, "text_bpe_merge_candidates")
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan
    cols = scan_columns(registry.QUERIES["text_bpe_merge_candidates"](spark, SF_T2))
    assert cols == ["text"]


def test_mix_weighted_filter_is_map_only(spark):
    """The hash-threshold keep filter must run at the scan side: the
    only exchange in the plan is the final per-source aggregation."""
    from pg2ch_spark.plans import exchange_count

    df = registry.QUERIES["pipeline_mix_weighted"](spark, SF_T2)
    assert exchange_count(df) == 1
    plan = _plan(spark, "pipeline_mix_weighted")
    assert "Join" not in plan  # pure filter + agg, no join of any kind


def test_pref_pairs_single_scan_single_exchange(spark):
    """Both extremes must come out of one aggregation: one corpus scan,
    one shuffle with map-side partials, no window, no self-join."""
    from pg2ch_spark.plans import exchange_count

    df = registry.QUERIES["pipeline_pref_pairs"](spark, SF_T2)
    plan = _plan(spark, "pipeline_pref_pairs")
    assert exchange_count(df) == 1
    assert plan.count("FileScan") == 1
    assert "Join" not in plan and "Window" not in plan
    # struct min/max plans as SortAggregate — still partial + final
    assert plan.count("Aggregate(key") + plan.count("HashAggregate(key") >= 2


def test_length_buckets_rank_is_sharded_and_broadcast(spark):
    """The global rank must come from shard-local windows + broadcast
    offsets — the raw corpus is never windowed in a single task."""
    import re

    plan = _plan(spark, "pipeline_length_buckets")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no corpus-wide single-partition window: the only SinglePartition
    # exchange is the |shards|-row offsets frame (which aggregates
    # before windowing), and n_total rides that same frame — no
    # second global agg, no cross join.
    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_ntile_dist_rank_is_sharded_and_broadcast(spark):
    """win_ntile_dist must never window the raw customer table in a
    single task: the global rank comes from _shard-partitioned windows
    plus broadcast offsets, so the only SinglePartition exchange is the
    |shards|-row offsets frame."""
    import re

    plan = _plan(spark, "win_ntile_dist")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 1
    # the full-table window is partitioned on the shard key
    assert "_shard" in plan


def test_incremental_dedup_shuffles_hashes_not_text(spark):
    """Both dedup steps key on md5(text): no plan node may shuffle or
    sort the raw text column."""
    import re

    plan = _plan(spark, "dedup_incremental_snapshot")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in m.group(1), m.group(0)


def test_embedding_standardize_stats_are_broadcast(spark):
    """The 64-row per-dimension moment table must broadcast back onto
    the exploded corpus — never a sort-merge join."""
    plan = _plan(spark, "embedding_standardize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q2_broadcasts_dims_and_takes_ordered(spark):
    """Q2's supplier/nation/region/part sides all broadcast; the
    top-100 must be TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "query_tpch_q2")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q16_not_in_is_broadcast_anti(spark):
    plan = _plan(spark, "query_tpch_q16")
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )


def test_tpch_q20_preaggregates_fact_before_joins(spark):
    """The lineitem 1995 shipment sums must aggregate BEFORE joining
    partsupp — the plan contains a HashAggregate whose child scans
    lineitem, below any join."""
    import re

    plan = _plan(spark, "query_tpch_q20")
    # the lineitem scan reads only the pre-agg's columns
    m = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li_scans = [cols for cols in m if "l_partkey" in cols]
    assert li_scans and all(
        set(c.split(":")[0] for c in cols.split(",")) <=
        {"l_partkey", "l_suppkey", "l_quantity", "l_shipdate"}
        for cols in li_scans
    )


def test_cohort_matrix_is_joinless_and_distinctless(spark):
    """The cohort matrix must come from ONE groupBy(user_id) — no join
    back to a firsts table, and no COUNT(DISTINCT) expansion: after the
    per-user (cohort_day, day-set) collapse each user owns one exploded
    row per cell, so the cell count is a plain count(*)."""
    plan = _plan(spark, "events_cohort_matrix")
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "Expand"):
        assert node not in plan, f"unexpected {node} in cohort-matrix plan"


def test_point_in_interval_join_is_blocked_not_nested_loop(spark):
    """No equi-key exists between points and intervals; the hour-grain
    blocking must make the match a shuffled/broadcast equi-join plus a
    residual range filter — never a nested-loop over all pairs."""
    plan = _plan(spark, "join_point_in_interval")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_active_rollup_avoids_distinct_expand(spark):
    """DAU/WAU/MAU must come from the min-offset collapse, not from a
    multi-COUNT(DISTINCT) aggregate (which would Expand the exploded
    contributions 3x); the day-grid semi-join must broadcast."""
    plan = _plan(spark, "events_active_rollup")
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_concurrency_sweep_has_no_pair_join(spark):
    """The sweep-line concurrency plan must contain NO row-scale join:
    the only join is the broadcast of the |shards|-row offset table.
    A SortMergeJoin/ShuffledHashJoin would mean the pair set is being
    materialized — the exact thing the sweep exists to avoid."""
    plan = _plan(spark, "events_concurrency_sweep")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the offsets broadcast


def test_weighted_bottomk_is_zero_shuffle(spark):
    """The weighted bottom-k sample must be one scan + TakeOrdered:
    rank keys are built in-row (array_min over salted hashes) and the
    global k-smallest is per-task heaps + driver merge — NO Exchange
    anywhere in the plan."""
    plan = _plan(spark, "sample_weighted_bottomk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_countmin_sketch_is_broadcast_and_topk_is_heap(spark):
    """The d×256-cell sketch must broadcast to the top-k lookup (never
    a row-scale shuffle join), and the exact top-k must be
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "agg_countmin_heavy")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_quality_ablation_single_pass_no_expand(spark):
    """The ablation matrix groups on the flag triple directly — no
    CUBE Expand — and the corpus fraction comes from a 1-row total
    broadcast (BNLJ with a single-row build side), not a row-scale
    join."""
    plan = _plan(spark, "pipeline_quality_ablation")
    assert "Expand" not in plan
    assert "SortMergeJoin" not in plan


def test_interval_overlap_blocked_join_no_nested_loop(spark):
    """Interval×interval overlap must ride the grain equi-join (the
    small monitor side may broadcast — that is the right call), never
    a nested loop; the first-common-grain rule means no Distinct/
    Dedup node appears for pair dedup."""
    plan = _plan(spark, "join_interval_overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_hll_dyadic_state_is_integer_and_tiny(spark):
    """The HLL plan must aggregate to the 256-bucket integer state via
    partial max (map-side combine IS the sketch merge) — shiftleft
    (integer) in the aggregate, and no float sum anywhere before the
    single estimate division."""
    plan = _plan(spark, "agg_hll_dyadic_exact")
    assert plan.count("HashAggregate") >= 4  # partial+final for bucket max and state
    assert "shiftleft" in plan


def test_matryoshka_recall_is_one_scan_all_tiers(spark):
    """Every truncation tier must ride ONE corpus pass: the broadcast
    (query × k) side fans out in-row — no SortMergeJoin anywhere, and
    the embeddings table is scanned a bounded number of times (corpus
    pass + the tiny query-side build), never once per tier."""
    plan = _plan(spark, "sim_matryoshka_recall")
    assert "SortMergeJoin" not in plan
    # exactly 2 file scans: the corpus pass and the pushed-down query
    # build (vec_id < 10). Baseline membership is a window flag over
    # (query, neighbor), NOT a self-join — a join build side would
    # recompute the corpus pass.
    assert plan.count("FileScan parquet") <= 2


def test_day_streaks_single_exchange(spark):
    """Gaps-and-islands at day scale: the row_number window, the island
    rollup, and the per-user rollup must all reuse ONE user-key
    Exchange (the events_sessionize property)."""
    plan = _plan(spark, "events_day_streaks")
    import re

    hash_exchanges = re.findall(r"Exchange hashpartitioning\(user_id", plan)
    assert len(hash_exchanges) == 1, plan.count("Exchange")


def test_segment_overlap_is_joinless(spark):
    """The overlap matrix must come from one groupBy(user_id) + in-row
    pair explode — no join of per-type user lists anywhere."""
    plan = _plan(spark, "events_segment_overlap")
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin"):
        assert node not in plan, f"unexpected {node}"


def test_rfm_segmentation_has_no_global_row_window(spark):
    """RFM (VERDICT r6 item 2): the three quartiles must come from the
    sharded two-pass rank — NO unpartitioned ntile sort over the
    users-scale table. The only SinglePartition exchanges feed the
    coarse-bucket offset frames (one per tier, post-aggregation), and
    no ntile window function survives in the plan."""
    import re

    plan = _plan(spark, "events_rfm_segmentation")
    assert "ntile" not in plan, "global ntile window is back"
    # row-level windows are partitioned (value / uid-bucket keys);
    # global exchanges only carry the aggregated bucket tables
    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 3
    assert "BroadcastNestedLoopJoin" not in plan


def test_market_basket_pairs_are_in_row_and_topk_is_heap(spark):
    """Basket pairs must come from the in-row explode of per-order
    brand sets (no basket self-join → no SortMergeJoin); marginals
    broadcast; global top-k is TakeOrderedAndProject."""
    plan = _plan(spark, "orders_market_basket")
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_skipgram_pmi_broadcasts_vocab_and_heaps_topk(spark):
    """The unigram table must broadcast onto the pair table (vocab is
    tiny); no row-scale shuffle join; top-k by heap."""
    plan = _plan(spark, "text_skipgram_pmi")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_pareto_and_cusum_have_no_row_scale_join(spark):
    """Both cumulative statistics run over bounded aggregates (parts /
    calendar days); their only joins are 1-row or per-type totals
    broadcast back — never a shuffle join of the fact table."""
    for key in ("orders_pareto_abc", "events_cusum_drift"):
        plan = _plan(spark, key)
        assert "SortMergeJoin" not in plan, key
        assert "ShuffledHashJoin" not in plan, key


def test_prefix_filter_candidates_avoid_nested_loop(spark):
    """AllPairs candidate generation must stay an equi-join on the
    shingle key: the size-window predicates ride the g-key join as
    post-conditions, never a BroadcastNestedLoopJoin or cartesian
    product (which would re-create the all-pairs cost the prefix
    filter exists to remove)."""
    for key in ("text_near_dedup_ngram_jaccard", "text_containment_pairs"):
        plan = _plan(spark, key)
        assert "BroadcastNestedLoopJoin" not in plan, key
        assert "CartesianProduct" not in plan, key


def test_variant_shred_is_single_shuffle(spark):
    """parse-once/extract-many: everything before the final aggregate
    is map-side — exactly one Exchange (the groupBy), no joins."""
    plan = _plan(spark, "fn_variant_shred")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
