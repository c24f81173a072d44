"""Edge-input regression tests: short documents and crash recovery.

The sf fixtures contain no document shorter than ~100 chars, so the
short-doc failure modes (Spark's ``sequence(1, n)`` DESCENDS when
n < 1, emitting spurious positions where DuckDB's ``range(1, n)``
emits none — crashing ``slice`` at start=0 in the worst case) never
fire in the differential suite. These tests run the affected queries
on a synthetic corpus that is mostly short/degenerate docs and diff
against the same DuckDB oracle on the same parquet.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import pyspark.sql.functions as F

from pg2ch_spark import registry
from tests.conftest import SF_T2
from tests.oracle import compare_frames

SHORT_DOCS = pd.DataFrame(
    {
        "doc_id": list(range(1, 13)),
        "text": [
            "",  # empty
            "a",  # single char (lang-id bigram edge)
            "ab",  # exactly one bigram
            "abcdefg",  # 7 chars: below shingle k=8
            "abcdefgh",  # exactly k: one shingle, no complete window
            "abcdefghij",  # k+w-2 = 10: still no complete window
            "abcdefghijk",  # k+w-1 = 11: exactly one window
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "x y",
            "hello world hello world hello world",
            "zzzzzzzzzzzzzzzzzzzzzzzz",
        ],
        "lang": ["en", "en", "de", "fr", "en", "de", "fr", "en", "en", "de", "fr", "en"],
        "source": ["edge"] * 12,
        "n_chars": [0, 1, 2, 7, 8, 10, 11, 44, 40, 3, 35, 24],
    }
)


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    SHORT_DOCS.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "key",
    [
        "text_fingerprint",
        "text_lang_id",
        "text_quality_score",
        # round 3: repetition scoring must drop sub-bigram docs in BOTH
        # engines, and the scrub must count zero redactions gracefully
        "text_repetition_signals",
        "text_pii_scrub",
    ],
)
def test_short_docs_match_oracle(spark, edge_sf_dir, edge_duck, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    spark_pdf = qs[key](spark, edge_sf_dir).toPandas()
    oracle_pdf = edge_duck.execute(oracles[key]).df()
    r = compare_frames(key, spark_pdf, oracle_pdf)
    assert r.ok, str(r)


def test_merge_sink_recovers_from_interrupted_commit(spark, tmp_path):
    """Crash between _commit's two renames leaves only '.old'; state()
    must recover it (checkpointed offsets have already advanced, so a
    lost state dir would silently drop acked batches)."""
    from pg2ch_spark.cdc.merge_sink import ReplacingMergeSink

    path = str(tmp_path / "state")
    sink = ReplacingMergeSink(spark, path, key_col="k", ver_col="v")
    b1 = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k int, v int, val string")
    sink.merge(b1)

    # Simulate the crash point: current renamed away, staging never promoted.
    os.rename(path, path + ".old")
    assert not os.path.exists(path)

    recovered = sink.state()
    assert recovered is not None
    assert sorted(r.k for r in recovered.collect()) == [1, 2]
    assert os.path.exists(path)  # recovery promoted .old back

    # And the sink keeps working after recovery.
    b2 = spark.createDataFrame([(1, 30, "c")], "k int, v int, val string")
    sink.merge(b2)
    final = {r.k: r.val for r in sink.state().collect()}
    assert final == {1: "c", 2: "b"}


# ---------------------------------------------------------------------------
# Event-shape edges: the sf fixtures' 150 users all sign up and emit
# dense event streams, so funnel level 0, views-before-signup, window-
# edge ties, and CDC logs whose FIRST op is U or D never occur there.
# This corpus pins each branch against the same oracle SQL.

def _edge_events() -> pd.DataFrame:
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []  # (user_id, offset_s, event_type)
    add = lambda u, off, et: rows.append((u, off, et))  # noqa: E731
    # u1: no signup at all -> funnel level 0; CDC first ops are U (view)
    add(1, 10, "view"); add(1, 20, "purchase"); add(1, 30, "click")
    # u2: signup only -> level 1
    add(2, 0, "signup")
    # u3: signup + view in window, no purchase -> level 2
    add(3, 0, "signup"); add(3, 100, "view")
    # u4: full chain inside the window -> level 3
    add(4, 0, "signup"); add(4, 100, "view"); add(4, 200, "purchase")
    # u5: view BEFORE the signup only -> level 1
    add(5, 0, "view"); add(5, 100, "signup")
    # u6: view outside the 1h window -> level 1
    add(6, 0, "signup"); add(6, 3601, "view")
    # u7: view at window edge (exactly 3600s: included, <=), purchase past it -> level 2
    add(7, 0, "signup"); add(7, 3600, "view"); add(7, 3601, "purchase")
    # u8: purchase BEFORE view (order violation) -> level 2
    add(8, 0, "signup"); add(8, 10, "purchase"); add(8, 20, "view")
    # u9: view at the SAME second as signup (strict >) -> level 1
    add(9, 0, "signup"); add(9, 0, "view")
    # u10: greedy anchors at FIRST signup; chain fits only the second -> level 1
    add(10, 0, "signup"); add(10, 5000, "signup"); add(10, 5100, "view"); add(10, 5200, "purchase")
    # u11: CDC first op is D (error) — the empty-array explode branch
    add(11, 0, "error"); add(11, 10, "view")
    return pd.DataFrame(
        {
            "event_id": range(1, len(rows) + 1),
            "ts": [t0 + pd.Timedelta(seconds=off) for _, off, _ in rows],
            "user_id": [u for u, _, _ in rows],
            "event_type": [et for _, _, et in rows],
            "value": [float(i) for i in range(len(rows))],
            "props": ['{"k": 1}'] * len(rows),
        }
    )


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    df = _edge_events()
    # ns-precision timestamps, exactly like the real fixtures (Spark
    # reads them via nanosAsLong; DuckDB natively)
    df.to_parquet(os.path.join(d, "events.parquet"), coerce_timestamps=None)
    return str(d)


@pytest.fixture(scope="module")
def edge_events_duck(edge_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "key",
    [
        "events_window_funnel",
        "events_retention",
        "events_funnel",
        "cdc_versioned_collapsing",
        "cdc_summing_final",
        # round 4: tiny corpus exercises single-user cohorts, sub-window
        # liveness, and the monitor-set-empty path of the overlap join
        "events_cohort_matrix",
        "events_active_rollup",
        "events_concurrency_sweep",
        "join_point_in_interval",
        "join_interval_overlap",
    ],
)
def test_event_edges_match_oracle(spark, edge_events_dir, edge_events_duck, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    r = compare_frames(
        key,
        qs[key](spark, edge_events_dir).toPandas(),
        edge_events_duck.execute(oracles[key]).df(),
    )
    assert r.ok, str(r)


def test_window_funnel_levels_are_the_designed_ones(spark, edge_events_dir):
    """The corpus is constructed so levels are known a priori:
    u1→0, u2/u5/u6/u9/u10→1, u3/u7/u8→2, u4→3 (u11 has no signup→0)."""
    res = {
        int(r.level): int(r.n_users)
        for r in registry.queries()["events_window_funnel"](spark, edge_events_dir).collect()
    }
    assert res == {0: 2, 1: 5, 2: 3, 3: 1}, res


# ---------------------------------------------------------------------------
# Empty-corpus edges: a real pipeline feeds empty inputs constantly (a
# filter that matched nothing, an empty partition, a new tenant). Both
# engines must agree on the empty-input result too — global aggregates
# produce their one all-null/zero row, per-group ones produce no rows.

@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    # Empty pandas frames lose column types (object -> null/int32 in
    # parquet), so every empty table is written with its EXPLICIT
    # arrow schema — same shapes as the real fixtures.
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_sf")
    schemas = {
        "documents": pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
        "events": pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("ns")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
        "embeddings": pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.string()),
            ]
        ),
    }
    for name, schema in schemas.items():
        pq.write_table(schema.empty_table(), os.path.join(d, f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_duck(empty_sf_dir):
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "key",
    [
        "text_exact_dedup",
        "text_quality_score",
        "text_fingerprint",
        "split_train_holdout",
        "embedding_quantize_int8",
        "events_window_funnel",
        "events_retention",
        "events_funnel",
        "cdc_versioned_collapsing",
        "cdc_summing_final",
        "pipeline_pretrain_filter",
        "text_chunk_overlap",
        "sample_stratified_hash",
        # round 3 (documents/events/embeddings-table keys only — the
        # empty fixture set has no relational tables)
        "text_repetition_signals",
        "text_pii_scrub",
        "events_gap_fill",
        "win_cum_distinct_users",
        "embedding_mean_pool",
        # round 4 (sim_pca_power_component excluded by contract: the
        # principal direction of an empty corpus is undefined)
        "text_bpe_merge_candidates",
        "pipeline_mix_weighted",
        "pipeline_pref_pairs",
        "pipeline_length_buckets",
        "dedup_incremental_snapshot",
        "corpus_mixture_entropy",
        "embedding_standardize",
        "events_transition_matrix",
        "events_top_paths",
        # round 4 session batch (agg_kmv_intersect and
        # agg_hll_dyadic_exact excluded by contract: single-row
        # summary reports over an empty corpus hit DuckDB's
        # aggregate-over-empty NULL-row vs Spark's zero-row divide —
        # like pca, their empty-corpus value is undefined;
        # pipeline_corpus_report likewise)
        "events_cohort_matrix",
        "events_active_rollup",
        "events_concurrency_sweep",
        "join_point_in_interval",
        "join_interval_overlap",
        "events_day_streaks",
        "events_segment_overlap",
        "events_time_to_convert",
        "agg_countmin_heavy",
        "sample_weighted_bottomk",
        "pipeline_quality_ablation",
        "text_containment_pairs",
        "pipeline_e2e_prep",
        "cdc_aggregating_final",
    ],
)
def test_empty_inputs_match_oracle(spark, empty_sf_dir, empty_duck, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    r = compare_frames(
        key,
        qs[key](spark, empty_sf_dir).toPandas(),
        empty_duck.execute(oracles[key]).df(),
    )
    assert r.ok, str(r)


# ---------------------------------------------------------------------------
# Randomized event corpus: a seeded pseudo-random stream (bursts, ties,
# repeated types, multi-signup users) — shapes no hand-designed corpus
# enumerates — diffed against the same oracles. Deterministic seed so
# failures reproduce.

@pytest.fixture(scope="module")
def random_events_dir(tmp_path_factory):
    import numpy as np

    rng = np.random.default_rng(20260813)
    n = 600
    # 1..120 so the monitor-set selector (user_id % 50 == 0) of
    # join_interval_overlap has real members (50, 100); every test on
    # this fixture is differential, so the generator change is
    # self-consistent on both engines.
    users = rng.integers(1, 121, n)  # ~5 events/user, some sparse
    # bursty offsets: many events inside the same minute, some far apart
    offs = np.sort(rng.choice([1, 2, 5, 60, 600, 3600, 7200], n) * rng.integers(0, 50, n))
    types = rng.choice(
        ["signup", "view", "purchase", "click", "error"], n, p=[0.15, 0.3, 0.2, 0.2, 0.15]
    )
    t0 = pd.Timestamp("2024-06-01")
    # ~10% NULL values AND a negative range: the shipped fixtures have
    # neither, so the NULL paths of every value-summing/averaging/
    # percentile operator (sum ignores, count(col) skips, avg
    # denominators shrink) and the negative-halfway rounding direction
    # (Spark HALF_UP = away-from-zero for negatives too — must match
    # DuckDB's half-away) only get differential coverage here
    values = pd.Series(rng.uniform(-50, 100, n).round(3))
    values[rng.random(n) < 0.1] = None
    df = pd.DataFrame(
        {
            "event_id": range(1, n + 1),
            "ts": [t0 + pd.Timedelta(seconds=int(o)) for o in offs],
            "user_id": users.astype("int64"),
            "event_type": types,
            "value": values,
            "props": ['{"k": 1}'] * n,
        }
    )
    d = tmp_path_factory.mktemp("random_events")
    df.to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def random_events_duck(random_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{random_events_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "key",
    [
        "events_window_funnel",
        "events_retention",
        "events_funnel",
        "cdc_versioned_collapsing",
        "cdc_summing_final",
        "cdc_replacing_final",
        "cdc_collapsing_final",
        # round 3
        "events_gap_fill",
        "win_cum_distinct_users",
        "fn_regex",
        "agg_regr_linfit",
        "join_asof_tolerance",
        "cdc_pipeline_replicating",
        # round 4 behavior-analytics batch
        "cdc_aggregating_final",
        # argMax-family NULL-semantics pins (round 4): these three ride
        # extremum aggregates whose bare NULL behavior diverges across
        # engines — kept here so the 10%-NULL corpus guards the pins
        "agg_argmax",
        "join_asof",
        "join_asof_nearest",
        "agg_kmv_intersect",
        "events_segment_overlap",
        "events_day_streaks",
        "events_rfm_segmentation",
        "events_cohort_matrix",
        "events_active_rollup",
        "events_concurrency_sweep",
        "join_point_in_interval",
        "join_interval_overlap",
        "agg_hll_dyadic_exact",
    ],
)
def test_random_events_match_oracle(spark, random_events_dir, random_events_duck, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    r = compare_frames(
        key,
        qs[key](spark, random_events_dir).toPandas(),
        random_events_duck.execute(oracles[key]).df(),
    )
    assert r.ok, str(r)


def test_hll_sketch_merge_precision(spark):
    """The sketch path's contract: per-type estimates and the
    sketch-UNION global estimate both land within 5% of exact distinct
    counts (datasketches HLL at default lgK=12 is ~1.6% RSE; 5% is
    3 sigma). The global row must come from merging per-type sketch
    states, never from rescanning raw events — asserted by exactness
    bound only, the plan has one scan by construction."""
    qs = registry.queries()
    got = {
        r["event_type"]: r["approx_users"]
        for r in qs["agg_hll_sketch_merge"](spark, SF_T2).collect()
    }
    ev = spark.read.parquet(SF_T2 + "/events.parquet")
    exact_all = ev.select("user_id").distinct().count()
    exact_types = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert abs(got["ALL"] - exact_all) / exact_all < 0.05
    for et, exact in exact_types.items():
        assert abs(got[et] - exact) / exact < 0.05, (et, got[et], exact)


@pytest.mark.parametrize(
    ("seed", "n_users", "n_rows"),
    [(11, 500, 20_000), (23, 5_000, 60_000), (47, 40_000, 120_000)],
)
def test_hll_sketch_merge_precision_synthetic(
    spark, tmp_path, seed, n_users, n_rows
):
    """The ±5% bound must hold across corpus sizes and RNGs, not just
    the one fixture draw: small (all users seen per type), mid, and a
    cardinality (40k) well past lgK=12's exact-mode threshold where
    the estimator is genuinely probabilistic."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n_rows, dtype="int64"),
            "ts": pd.Timestamp("2024-06-01")
            + pd.to_timedelta(rng.integers(0, 86400, n_rows), unit="s"),
            "user_id": rng.integers(0, n_users, n_rows).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], n_rows
            ),
            "value": rng.uniform(0, 100, n_rows),
            "props": ['{"k":1}'] * n_rows,
        }
    )
    sf = tmp_path / "sf_hll"
    os.makedirs(sf)
    pdf.to_parquet(sf / "events.parquet")

    qs = registry.queries()
    got = {
        r["event_type"]: r["approx_users"]
        for r in qs["agg_hll_sketch_merge"](spark, str(sf)).collect()
    }
    exact_all = pdf["user_id"].nunique()
    assert abs(got["ALL"] - exact_all) / exact_all < 0.05
    for et, grp in pdf.groupby("event_type"):
        exact = grp["user_id"].nunique()
        assert abs(got[et] - exact) / exact < 0.05, (et, got[et], exact)


def test_dedup_cluster_transitive_chain(spark, tmp_path):
    """Connected components must merge by TRANSITIVITY: A~B and B~C
    put A and C in one cluster even though jaccard(A, C) < 0.5.
    Crafted 3-gram sets: A-B = 0.6, B-C = 0.6, A-C = 0.45; D isolated
    (no edges, so it never enters the pair graph)."""
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j", "en", "src1", 19),
            (1, "a b c d e f g h i k", "en", "src1", 19),
            (2, "x y c d e f g h i k", "en", "src1", 19),
            (3, "p q r s t u v w p2 q2", "en", "src1", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    qs = registry.queries()
    rows = {
        r["cluster_id"]: (r["n_docs"], r["doc_max"])
        for r in qs["dedup_cluster_components"](spark, str(tmp_path)).collect()
    }
    assert rows == {0: (3, 2)}, rows


# ---------------------------------------------------------------------------
# Randomized document corpus (round 3): seeded random token streams with
# heavy repeats, shared shingles, near-dup pairs and tiny docs — the
# text/dedup operator family diffed against the same oracles on shapes
# no hand-built corpus enumerates.


@pytest.fixture(scope="module")
def random_docs_dir(tmp_path_factory):
    import numpy as np

    rng = np.random.default_rng(314159)
    vocab = [f"w{i}" for i in range(30)] + ["key", "token", "the", "a"]
    n = 120
    texts = []
    for i in range(n):
        ln = int(rng.integers(1, 60))
        toks = list(rng.choice(vocab, ln))
        if i % 7 == 0 and ln > 4:  # degenerate repetition
            toks = toks[:2] * (ln // 2)
        texts.append(" ".join(toks))
    # exact duplicates and near-duplicates (shared prefixes)
    texts[5] = texts[3]
    texts[11] = texts[9] + " w0"
    df = pd.DataFrame(
        {
            "doc_id": range(1, n + 1),
            "text": texts,
            # every 11th doc has NULL lang: lang = 'en' comparisons must
            # be NULL-false on both engines (filters, ablation gates,
            # corpus-report ratios)
            "lang": [
                None if i % 11 == 0 else ["en", "de", "fr", "es", "zh"][i % 5]
                for i in range(n)
            ],
            "source": [f"src{i % 4}" for i in range(n)],
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path_factory.mktemp("random_docs")
    df.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def random_docs_duck(random_docs_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{random_docs_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "key",
    [
        "text_repetition_signals",
        "text_pii_scrub",
        "text_vocab_heavy_hitters",
        "text_exact_dedup",
        "text_token_stats",
        "text_near_dedup_ngram_jaccard",
        "text_decontaminate",
        "pipeline_pretrain_filter",
        # round 4
        "text_bpe_merge_candidates",
        "pipeline_mix_weighted",
        "pipeline_pref_pairs",
        "pipeline_length_buckets",
        "dedup_incremental_snapshot",
        "corpus_mixture_entropy",
        # round 4 summaries batch
        "text_skipgram_pmi",
        "agg_countmin_heavy",
        "sample_weighted_bottomk",
        "pipeline_quality_ablation",
    ],
)
def test_random_docs_match_oracle(spark, random_docs_dir, random_docs_duck, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    r = compare_frames(
        key,
        qs[key](spark, random_docs_dir).toPandas(),
        random_docs_duck.execute(oracles[key]).df(),
    )
    assert r.ok, str(r)


# ---------------------------------------------------------------------------
# Randomized embeddings corpus (round 3): seeded random vectors with
# deliberate near-duplicate pairs and a duplicated-vector pathology —
# the similarity/ANN family diffed against the same oracles.


@pytest.fixture(scope="module")
def random_emb_dir(tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(271828)
    n, d = 150, 64
    base = rng.normal(0, 1, (n, d)).astype("float32")
    base[7] = base[3] + rng.normal(0, 0.01, d).astype("float32")  # near-dup
    base[11] = base[3]  # exact dup vector
    # zero-norm corpus rows (incl. an exact-dup zero pair): cosine
    # against these is 0/0 — Spark 4 ANSI division THROWS without the
    # try_divide guards, and a kept NaN would out-rank every real score
    base[2] = 0.0
    base[5] = 0.0
    base[13] = base[5]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in base],
                                  pa.list_(pa.float32())),
            "label": pa.array([int(i % 10) for i in range(n)], pa.int32()),
        }
    )
    dd = tmp_path_factory.mktemp("random_emb")
    pq.write_table(tbl, os.path.join(dd, "embeddings.parquet"))
    return str(dd)


@pytest.fixture(scope="module")
def random_emb_duck(random_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{random_emb_dir}/embeddings.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "key",
    [
        "sim_cosine_topk",
        "sim_knn_join",
        "sim_near_dup_embedding",
        "sim_ann_ivf",
        "sim_ivf_recall",
        "embedding_mean_pool",
        "embedding_quantize_int8",
        "sim_centroid_classify",
        "sim_lsh_hyperplane",
        # round 4
        "embedding_standardize",
        "sim_pca_power_component",
        "sim_ann_kmeans_train",
        "sim_cluster_purity",
        "sim_matryoshka_recall",
    ],
)
def test_random_embeddings_match_oracle(spark, random_emb_dir, random_emb_duck, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    r = compare_frames(
        key,
        qs[key](spark, random_emb_dir).toPandas(),
        random_emb_duck.execute(oracles[key]).df(),
    )
    assert r.ok, str(r)


# ---------------------------------------------------------------------------
# Property tests (hypothesis): closed-form invariants checked across the
# whole input space, not just the fixture sizes.

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=1, max_value=5000))
def test_ntile_closed_form_matches_sql_semantics(n):
    """pipeline_length_buckets computes ntile(4) from the global rank in
    closed form; property: for ANY corpus size the formula reproduces
    SQL ntile semantics — first n mod k buckets get ceil(n/k) rows, the
    rest floor(n/k), buckets contiguous and non-decreasing in rank."""
    k = 4
    base, rem = divmod(n, k)

    def bucket(rk: int) -> int:  # the operator's formula
        big = rem * (base + 1)
        if rk <= big:
            return -(-rk // (base + 1))  # ceil
        return rem + (-(-(rk - big) // base))

    sizes = {}
    prev = 0
    for rk in range(1, n + 1):
        b = bucket(rk)
        assert b >= prev  # contiguous, non-decreasing
        prev = b
        sizes[b] = sizes.get(b, 0) + 1
    expected = {
        b: (base + 1 if b <= rem else base)
        for b in range(1, min(k, n) + 1)
        if (base + 1 if b <= rem else base) > 0
    }
    assert sizes == expected


@settings(max_examples=50, deadline=None)
@given(
    password=st.text(min_size=1, max_size=40).filter(lambda s: "," not in s),
    salt=st.binary(min_size=8, max_size=24),
    iters=st.integers(min_value=1, max_value=4096),
    cnonce=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=8,
        max_size=24,
    ),
    snonce_ext=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=8,
        max_size=24,
    ),
)
def test_scram_proof_round_trip(password, salt, iters, cnonce, snonce_ext):
    """Property: for ANY password/salt/iteration-count/nonces, the
    client proof the walsender client computes verifies under the
    server-side SCRAM check (RFC 5802 §3), and the expected server
    signature matches the one the server would emit."""
    import base64
    import hashlib
    import hmac as hmac_mod

    from pg2ch_spark.sources import pgoutput as pg

    first_bare = f"n=,r={cnonce}"
    server_first = (
        f"r={cnonce}{snonce_ext},s={base64.b64encode(salt).decode()},i={iters}"
    )
    final, expected_server_sig = pg.scram_client_final(
        password, first_bare, server_first
    )
    attrs = dict(p.split("=", 1) for p in final.split(","))
    # server-side verification
    salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)
    client_key = hmac_mod.new(salted, b"Client Key", hashlib.sha256).digest()
    stored_key = hashlib.sha256(client_key).digest()
    without_proof = final.rsplit(",p=", 1)[0]
    auth_msg = ",".join([first_bare, server_first, without_proof]).encode()
    client_sig = hmac_mod.new(stored_key, auth_msg, hashlib.sha256).digest()
    assert base64.b64decode(attrs["p"]) == bytes(
        a ^ b for a, b in zip(client_key, client_sig)
    )
    server_key = hmac_mod.new(salted, b"Server Key", hashlib.sha256).digest()
    assert (
        hmac_mod.new(server_key, auth_msg, hashlib.sha256).digest()
        == expected_server_sig
    )


# ---------------------------------------------------------------------------
# Sketch property tests (round 4): the count-min bound must hold for
# EVERY token (the declared query only exposes the top-10), and the
# dyadic HLL's relative error must stay inside the theoretical band on
# corpora it was never tuned on.

def test_countmin_bound_holds_for_every_token(spark, duck):
    """est >= true for ALL tokens — the one-sided CM guarantee, checked
    exhaustively by recomputing the sketch in DuckDB and joining every
    token against its estimate."""
    overs = duck.execute("""
        WITH t AS (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE length(text) > 0
        ), counts AS (
            SELECT token, count(*) AS n FROM t WHERE token <> '' GROUP BY token
        ), buckets AS (
            SELECT token, n, j, substr(md5(token), 2 * j + 1, 2) AS bucket
            FROM counts, unnest(range(0, 4)) AS r(j)
        ), sketch AS (
            SELECT j, bucket, sum(n) AS c FROM buckets GROUP BY j, bucket
        ), est AS (
            SELECT b.token, any_value(b.n) AS true_n, min(s.c) AS est_n
            FROM buckets b JOIN sketch s ON s.j = b.j AND s.bucket = b.bucket
            GROUP BY b.token
        )
        SELECT count(*) FILTER (WHERE est_n < true_n) AS violations,
               count(*) AS n_tokens
        FROM est
    """).fetchone()
    violations, n_tokens = overs
    assert n_tokens > 0
    assert violations == 0, f"{violations}/{n_tokens} tokens under-estimated"


@pytest.fixture(scope="module")
def constant_sigma_dir(tmp_path_factory):
    """sf0.001 with one event type's values forced constant and
    embedding dim 1 forced constant — every z-style score divides by a
    ZERO sigma/variance there. Spark 4's ANSI mode turns a bare / into
    a job-killing DIVIDE_BY_ZERO; the oracles yield NULL. These rows
    prove the try_divide guards degrade identically."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("const_sigma"))
    ev = pq.read_table(f"{src}/events.parquet").to_pandas()
    const_type = ev["event_type"].unique()[0]
    ev.loc[ev.event_type == const_type, "value"] = 42.5
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   f"{dst}/events.parquet")
    emb = pq.read_table(f"{src}/embeddings.parquet").to_pandas()

    def set_dim0(v):
        v = np.array(v, dtype=np.float32)
        v[0] = 7.25
        return v

    emb["embedding"] = emb["embedding"].map(set_dim0)
    pq.write_table(pa.Table.from_pandas(emb, preserve_index=False),
                   f"{dst}/embeddings.parquet")
    from pg2ch_spark.catalog import TABLES

    for t in TABLES:
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{src}/{t}.parquet", p)
    return dst


@pytest.mark.parametrize(
    "key", ["events_anomaly_zscore", "events_abtest_lift", "embedding_standardize"]
)
def test_zero_sigma_groups_degrade_like_the_oracle(spark, constant_sigma_dir, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{constant_sigma_dir}/{t}.parquet')"
        )
    r = compare_frames(
        key,
        qs[key](spark, constant_sigma_dir).toPandas(),
        con.execute(oracles[key]).df(),
    )
    assert r.ok, str(r)


def test_salted_skew_sum_is_order_independent_across_sfs(spark):
    """weighted_total must match the oracle at EVERY shipped sf: a
    double sum over 16 salt partitions associates in partition order
    and landed a round-2 boundary off the oracle at sf0.001 before the
    sum was decimal-mediated (the per-row double product is
    IEEE-identical in both engines; only the summation order differed)."""
    from pg2ch_spark import registry

    qs, oracles = registry.queries(), registry.oracle_sql()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet')"
        )
        r = compare_frames(
            "join_salted_skew",
            qs["join_salted_skew"](spark, sf_dir).toPandas(),
            con.execute(oracles["join_salted_skew"]).df(),
        )
        assert r.ok, f"{sf_dir}: {r}"


def test_hll_dyadic_error_within_band(spark):
    """|est - true| / true must stay within 3 × 1.04/sqrt(256) ≈ 19.5%
    on all three event corpora (shipped sf0.01 + sf0.001 + sf0.1) —
    the raw-estimator band, no corpus-specific tuning."""
    from pg2ch_spark import registry

    qs = registry.queries()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        row = qs["agg_hll_dyadic_exact"](spark, sf_dir).collect()[0]
        rel = abs(row.est - row.true_n) / row.true_n
        assert rel < 3 * 1.04 / 16, f"{sf_dir}: rel err {rel:.3f}, true {row.true_n}"


def test_sweep_equals_blocked_join_on_tie_heavy_corpus(spark, tmp_path):
    """The sweep-line concurrency and the blocked containment join are
    two physical strategies for ONE semantic — they must agree row-for-
    row on a corpus built to stress every boundary: span lo == hi
    (instant spans), purchases exactly AT lo and AT hi, multiple
    markers on the same second, spans and purchases crossing hour-grain
    edges, and a purchase at hi+1 (must NOT count that span)."""
    t0 = pd.Timestamp("2024-03-01 00:00:00")
    rows = []  # (user, off_s, type)
    # u1: span [0, 3600] exactly one grain wide; purchases at lo, hi, hi+1s-ish
    rows += [(1, 0, "view"), (1, 3600, "view")]
    rows += [(2, 0, "purchase")]          # at u1.lo (and its own instant span)
    rows += [(3, 3600, "purchase")]       # at u1.hi
    rows += [(4, 3601, "purchase")]       # 1s past u1.hi -> u1 must not count
    # u5: instant span exactly at a grain boundary (7200)
    rows += [(5, 7200, "view")]
    rows += [(6, 7200, "purchase")]       # same second as u5's instant span
    # u7: span crossing a grain edge [7199, 7201]
    rows += [(7, 7199, "view"), (7, 7201, "view")]
    # u8: many markers at the same second as a purchase
    rows += [(8, 7200, "view"), (8, 7200, "click"), (8, 7200, "purchase")]
    pdf = pd.DataFrame(
        {
            "event_id": range(1, len(rows) + 1),
            "ts": [t0 + pd.Timedelta(seconds=o) for _, o, _ in rows],
            "user_id": [u for u, _, _ in rows],
            "event_type": [t for _, _, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    d = str(tmp_path / "ties")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"), coerce_timestamps=None)

    qs = registry.queries()
    a = qs["join_point_in_interval"](spark, d).toPandas()
    b = qs["events_concurrency_sweep"](spark, d).toPandas()
    r = compare_frames("sweep-vs-join", a, b)
    assert r.ok, str(r)
    # spot-check the designed boundaries
    got = {int(row.purchase_id): int(row.n_active) for row in a.itertuples()}
    by_uid = {u: i + 1 for i, (u, _, _) in enumerate(rows) if rows[i][2] == "purchase"}
    # u4's purchase at 3601: u1's span [0,3600] must NOT count; only its own
    assert got[by_uid[4]] == 1
    # u3's purchase at 3600: inside u1's span AND its own -> 2
    assert got[by_uid[3]] == 2


@settings(max_examples=60, deadline=None)
@given(
    na=st.integers(min_value=1, max_value=40),
    nb=st.integers(min_value=1, max_value=40),
    dim=st.integers(min_value=1, max_value=8),
    chunk=st.integers(min_value=1, max_value=7),
    upper=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_chunked_cos_pairs_matches_unchunked_reference(
    na, nb, dim, chunk, upper, seed
):
    """The shared cosine tile kernel must emit EXACTLY the pairs the
    dense unchunked reference would, regardless of where the chunk
    boundaries fall — including zero-norm vectors (NaN cosine drops,
    like the oracle's NULL) and the upper-triangle mask for
    self-tiles. Chunk sizes down to 1 exercise every boundary."""
    import numpy as np

    from pg2ch_spark.llm import neardup

    old_chunk = neardup._TILE_CHUNK
    neardup._TILE_CHUNK = chunk  # restored in the finally below
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(na, dim))
    B = A if upper else rng.normal(size=(nb, dim))
    # plant zero-norm rows to exercise the NaN path
    A[:: max(na // 3, 1)] = 0.0
    ids_a = np.arange(na, dtype="int64") * 7  # non-contiguous ids
    ids_b = ids_a if upper else (np.arange(len(B), dtype="int64") * 7 + 3)
    pre = 0.2

    try:
        got = neardup.chunked_cos_pairs(ids_a, A, ids_b, B, pre, upper_only=upper)
    finally:
        neardup._TILE_CHUNK = old_chunk

    # dense reference: same dimension-ordered fold, no chunking
    dots = np.zeros((len(A), len(B)))
    nrm_a, nrm_b = np.zeros(len(A)), np.zeros(len(B))
    for k in range(dim):
        dots += np.outer(A[:, k], B[:, k])
        nrm_a += A[:, k] * A[:, k]
        nrm_b += B[:, k] * B[:, k]
    cos = dots / np.outer(np.sqrt(nrm_a), np.sqrt(nrm_b))
    mask = cos >= pre
    if upper:
        mask &= ids_a[:, None] < ids_b[None, :]
    ai, bj = np.nonzero(mask)
    want = {
        (min(ids_a[i], ids_b[j]), max(ids_a[i], ids_b[j])): cos[i, j]
        for i, j in zip(ai, bj)
    }

    got_pairs = {
        (int(r.vec_a), int(r.vec_b)): float(r.c_raw) for r in got.itertuples()
    }
    assert got_pairs.keys() == want.keys()
    for k in want:
        # bit-exact: the fold order is identical chunked or not
        assert got_pairs[k] == want[k]


@pytest.fixture(scope="module")
def overflow_emb_dir(tmp_path_factory):
    """Corpus with OVERFLOW-norm duplicate vectors (an inf component —
    e.g. a float32 overflow upstream). Their self-cosine is inf/inf =
    NaN; this engine's declared boundary is that vectors whose norm is
    not in (0, inf) pair with NOTHING. (DuckDB itself would EMIT those
    pairs — it ranks NaN above every number — but surfacing NaN
    'matches' for corrupt payloads is the wrong degradation, so the
    divergence is deliberate and pinned here, not oracle-compared.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(31415)
    n, d = 40, 8
    base = rng.normal(0, 1, (n, d)).astype("float32")
    base[4] = base[1]  # a legitimate exact-dup pair: must still emit
    inf = np.float32("inf")
    base[6, 0] = inf
    base[9] = base[6]  # exact-dup OVERFLOW pair: must NOT emit
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in base], pa.list_(pa.float32())
            ),
            "label": pa.array([int(i % 4) for i in range(n)], pa.int32()),
        }
    )
    dd = tmp_path_factory.mktemp("overflow_emb")
    pq.write_table(tbl, str(dd / "embeddings.parquet"))
    return str(dd)


@pytest.mark.parametrize("key", ["sim_near_dup_embedding", "sim_lsh_hyperplane"])
def test_overflow_norm_vectors_pair_with_nothing(spark, overflow_emb_dir, key):
    qs = registry.queries()
    out = qs[key](spark, overflow_emb_dir).toPandas()
    bad = {6, 9}
    touched = set(out["vec_a"]).union(out["vec_b"])
    assert not (touched & bad), f"{key} emitted pairs for overflow-norm vectors"
    # the legitimate identical pair still comes through at cos 1.0
    pairs = {(int(a), int(b)) for a, b in zip(out["vec_a"], out["vec_b"])}
    assert (1, 4) in pairs
    assert float(out.set_index(["vec_a", "vec_b"]).loc[(1, 4), "cos_sim"]) == 1.0


@pytest.mark.parametrize("dist", ["massive_ties", "all_equal", "unique_floats",
                                  "negative_mix", "with_nulls"])
def test_ntile_distributed_matches_global_ntile(spark, dist):
    """windows.ntile_distributed (the RFM two-pass rank) must agree
    with the built-in global ntile on every ordering shape the sharding
    has to survive: a value tied across half the rows (monetary = 0),
    ALL rows equal (one shard carries everything through uid
    sub-buckets), unique floats (every value its own tie group), and
    negatives straddling the coarse-bucket sign boundary."""
    import random

    from pyspark.sql import Window

    from pg2ch_spark.operators.windows import ntile_distributed

    rng = random.Random(hash(dist) & 0xFFFF)
    n = 3000
    if dist == "massive_ties":
        vals = [0.0 if rng.random() < 0.5 else rng.choice([1.5, 2.0, 7.25])
                for _ in range(n)]
    elif dist == "all_equal":
        vals = [42.0] * n
    elif dist == "unique_floats":
        vals = [rng.random() * 1e6 for _ in range(n)]
    elif dist == "negative_mix":
        vals = [rng.uniform(-500, 500) for _ in range(n)]
    else:  # with_nulls: NULLs rank LAST (DESC NULLS LAST), never dropped
        vals = [None if rng.random() < 0.3 else rng.choice([0.0, 5.5, 9.0])
                for _ in range(n)]
    df = spark.createDataFrame(
        [(i * 17 % 10_000, v) for i, v in enumerate(vals)], "uid bigint, v double"
    ).where(F.col("uid") >= 0)
    got = {
        r.uid: r.t
        for r in ntile_distributed(
            df, "v", "uid", n=4, out_col="t", value_width=97.0, uid_width=128
        ).collect()
    }
    exp = {
        r.uid: r.t
        for r in df.withColumn(
            "t", F.ntile(4).over(Window.orderBy(F.col("v").desc(), "uid"))
        ).collect()
    }
    assert got == exp


def test_ntile_distributed_part_col_matches_per_partition_ntile(spark):
    """r8 partition-aware path (the melted-RFM form): ranking with
    part_col must equal the built-in ntile run independently per
    partition — including a partition that is one massive tie, one
    with NULLs, and partitions of unequal sizes (each drives its own
    ntile boundary off its own total)."""
    import random

    from pyspark.sql import Window

    from pg2ch_spark.operators.windows import ntile_distributed

    rng = random.Random(0xA5)
    rows = []
    for uid in range(2500):
        rows.append((uid, "r", float(rng.randint(0, 40))))
        rows.append((uid, "f", 0.0 if rng.random() < 0.6 else rng.random() * 9))
        if uid % 3 == 0:  # unequal partition sizes
            rows.append((uid, "m", None if rng.random() < 0.2 else rng.random()))
        if uid % 5 == 0:  # NULL partition KEY: its own group, never dropped
            rows.append((uid, None, rng.random() * 3))
    df = spark.createDataFrame(rows, "uid bigint, metric string, v double")
    got = {
        (r.uid, r.metric): r.t
        for r in ntile_distributed(
            df, "v", "uid", n=4, out_col="t",
            value_width=97.0, uid_width=128, part_col="metric",
        ).collect()
    }
    exp = {
        (r.uid, r.metric): r.t
        for r in df.withColumn(
            "t",
            F.ntile(4).over(
                Window.partitionBy("metric").orderBy(F.col("v").desc(), "uid")
            ),
        ).collect()
    }
    assert got == exp
