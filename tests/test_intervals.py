"""intervals.py — the scale-safe containment/overlap API (VERDICT r4
item 4: count/aggregate defaults, pair materialization behind opt-in,
minute-grain escalation for skewed hours).

Synthetic interval sets with a deliberately skewed hour; every result
is diffed against a DuckDB pair-join oracle, so the sweep decomposition
and the two-level blocking are proven exact, not just plausible.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pg2ch_spark.operators.intervals import (
    interval_overlap_aggregates,
    interval_overlap_pairs,
    point_in_interval,
)

T0 = 1_700_000_000  # fixed epoch base (no wall clock in tests)


@pytest.fixture(scope="module")
def interval_frames(spark):
    """~400 intervals over 3 days with a hot lunch hour (half of all
    intervals cram into one hour on day 1) plus uniform points."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(400):
        if i % 2 == 0:  # the skewed hour: everyone active 12:00-13:00 day 1
            lo = T0 + 12 * 3600 + int(rng.integers(0, 1800))
            hi = lo + int(rng.integers(60, 1800))
        else:
            day = int(rng.integers(0, 3))
            lo = T0 + day * 86400 + int(rng.integers(0, 80000))
            hi = lo + int(rng.integers(30, 20000))
        rows.append((i, lo, hi))
    spans = pd.DataFrame(rows, columns=["span_id", "lo", "hi"])
    pts = pd.DataFrame(
        {
            "point_id": np.arange(120),
            "t": T0 + rng.integers(0, 3 * 86400, size=120).astype(np.int64),
        }
    )
    con = duckdb.connect()
    con.register("spans", spans)
    con.register("pts", pts)
    return spark.createDataFrame(spans), spark.createDataFrame(pts), con


def test_point_in_interval_default_is_counts_and_exact(interval_frames):
    spans, pts, con = interval_frames
    got = (
        point_in_interval(pts, spans, time_col="t")
        .toPandas()
        .sort_values("point_id")
        .reset_index(drop=True)
    )
    exp = con.execute(
        """SELECT p.point_id, p.t, count(s.span_id) AS n_active
           FROM pts p JOIN spans s ON p.t BETWEEN s.lo AND s.hi
           GROUP BY 1, 2 ORDER BY 1"""
    ).df()
    # sweep returns every point; oracle inner-join drops zero-count points
    nonzero = got[got.n_active > 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(nonzero, exp, check_dtype=False)
    assert len(got) == 120  # default contract: all points, zero counts kept


def test_point_in_interval_pairs_optin_matches_oracle(interval_frames):
    spans, pts, con = interval_frames
    got = (
        point_in_interval(pts, spans, time_col="t", pairs=True)
        .toPandas()
        .sort_values(["point_id", "span_id"])
        .reset_index(drop=True)[["point_id", "span_id"]]
    )
    exp = con.execute(
        """SELECT p.point_id, s.span_id
           FROM pts p JOIN spans s ON p.t BETWEEN s.lo AND s.hi
           ORDER BY 1, 2"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


OVERLAP_ORACLE = """
    SELECT v.pspan AS pspan, count(*) AS n_overlaps,
           CAST(sum(least(v.phi, o.hi) - greatest(v.plo, o.lo)) AS BIGINT)
               AS overlap_s
    FROM probe v JOIN spans o
      ON o.span_id <> v.pspan AND v.plo <= o.hi AND o.lo <= v.phi
    GROUP BY 1 ORDER BY 1
"""


@pytest.fixture(scope="module")
def overlap_frames(spark, interval_frames):
    spans_df, _, con = interval_frames
    spans_pd = con.execute("SELECT * FROM spans").df()
    probe_pd = spans_pd[spans_pd.span_id % 7 == 0].rename(
        columns={"span_id": "pspan", "lo": "plo", "hi": "phi"}
    )
    con.register("probe", probe_pd)
    return spans_df, spark.createDataFrame(probe_pd), con


def _agg_pairs(df):
    import pyspark.sql.functions as F

    return (
        df.where(F.col("span_id") != F.col("pspan"))
        .groupBy("pspan")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum(
                F.least("phi", "hi") - F.greatest("plo", "lo")
            ).cast("bigint").alias("overlap_s"),
        )
    )


@pytest.mark.parametrize("hot_threshold", [10**9, 3])
def test_overlap_pairs_exact_with_and_without_escalation(
    overlap_frames, hot_threshold
):
    """hot_threshold=3 forces the skewed lunch hour (200 spans) — and
    most others — onto minute blocks; the pair set must be identical
    to the single-level plan and to the oracle either way."""
    spans, probe, con = overlap_frames
    got = (
        _agg_pairs(
            interval_overlap_pairs(
                probe, spans,
                probe_lo="plo", probe_hi="phi",
                build_lo="lo", build_hi="hi",
                hot_threshold=hot_threshold,
            )
        )
        .toPandas()
        .sort_values("pspan")
        .reset_index(drop=True)
    )
    exp = con.execute(OVERLAP_ORACLE).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_overlap_aggregates_sweep_matches_pair_oracle(overlap_frames):
    """The endpoint-prefix-sum decomposition (the library DEFAULT for
    overlap asks — no pair set at any stage) must reproduce the pair
    join's aggregates exactly, including the self-subtraction."""
    spans, probe, con = overlap_frames
    got = (
        interval_overlap_aggregates(
            probe, spans,
            probe_lo="plo", probe_hi="phi",
            build_lo="lo", build_hi="hi",
            subtract_self=True,
        )
        .toPandas()
        .sort_values("pspan")
        .reset_index(drop=True)[["pspan", "n_overlaps", "overlap_s"]]
    )
    exp = con.execute(OVERLAP_ORACLE).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_overlap_aggregates_keeps_zero_rows_without_self_subtract(
    overlap_frames, spark
):
    """Plain (subtract_self=False) contract: ONE row per probe interval,
    zero-overlap probes reported with (0, 0) — only the self-subtract
    form matches inner-join pair semantics and drops them."""
    spans, _, _ = overlap_frames
    probe_pd = pd.DataFrame(
        {
            "pspan": [9000, 9001],
            # 9000 sits 10 days past every span; 9001 covers day 1 noon
            "plo": [T0 + 10 * 86400, T0 + 12 * 3600],
            "phi": [T0 + 10 * 86400 + 60, T0 + 13 * 3600],
        }
    )
    got = (
        interval_overlap_aggregates(
            spark.createDataFrame(probe_pd), spans,
            probe_lo="plo", probe_hi="phi",
            build_lo="lo", build_hi="hi",
        )
        .toPandas()
        .sort_values("pspan")
        .reset_index(drop=True)
    )
    assert list(got.pspan) == [9000, 9001]
    assert got.loc[0, "n_overlaps"] == 0 and got.loc[0, "overlap_s"] == 0
    assert got.loc[1, "n_overlaps"] > 0


def test_overlap_aggregates_plan_has_no_pair_join(overlap_frames):
    """Scale guarantee of the default path: the only join is the
    |shards|-row offsets broadcast — no shuffled row-scale join, no
    nested loop, nothing output-sized."""
    spans, probe, _ = overlap_frames
    plan = interval_overlap_aggregates(
        probe, spans,
        probe_lo="plo", probe_hi="phi",
        build_lo="lo", build_hi="hi",
        subtract_self=True,
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_escalated_pairs_plan_stays_equi_join(overlap_frames):
    spans, probe, _ = overlap_frames
    plan = interval_overlap_pairs(
        probe, spans,
        probe_lo="plo", probe_hi="phi",
        build_lo="lo", build_hi="hi",
        hot_threshold=3,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shared_column_names_rejected(interval_frames):
    spans, pts, _ = interval_frames
    with pytest.raises(ValueError, match="disjoint|share column"):
        point_in_interval(pts.withColumnRenamed("t", "lo"), spans, time_col="lo")
