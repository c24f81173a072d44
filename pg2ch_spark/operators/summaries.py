"""Group D extensions (round 4 cont.) — mergeable sketch summaries and
deterministic weighted sampling.

Two operators built entirely in the HEX-STRING hash domain: md5
substrings serve as bucket keys and rank keys directly, so both engines
compare identical ASCII strings and no float or base-conversion ever
crosses the engine boundary (the lesson of the minhash oracle's painful
hex→int reconstruction — skipped here by never leaving hex).

Scale notes:
- count-min: the sketch is a CONSTANT-size (d×w ≤ 1 K rows) mergeable
  summary built with one map-side-combined shuffle over distinct
  tokens; estimates are broadcast lookups. This is the
  mergeable-summaries shape (cf. `agg_quantile_histogram_merge`,
  `text_vocab_heavy_hitters`): partial sketches from any partitioning
  merge by cell-wise addition, so a 100 TB corpus sketches in one pass
  with KB-scale state per executor.
- weighted bottom-k: ZERO-shuffle scan — each row derives its rank key
  in-row (array_min over its ≤W_MAX salted hashes) and the global
  bottom-k is TakeOrderedAndProject (per-task heaps, driver merge).
  Bottom-k sketches are mergeable by union+truncate, the distributed
  sampling primitive behind weighted reservoir/priority sampling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

# ---------------------------------------------------------------------------
# Count-min sketch — mergeable approximate counts with a one-sided
# (overestimate-only) error bound, exactly reproducible cross-engine.

_CM_DEPTH = 4  # hash rows: disjoint 2-hex-char slices of md5(token)
_CM_TOPK = 10


@register(
    "agg_countmin_heavy",
    oracle=f"""
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE length(text) > 0
    ), counts AS (
        SELECT token, count(*) AS n FROM t WHERE token <> '' GROUP BY token
    ), buckets AS (
        SELECT token, n, j, substr(md5(token), 2 * j + 1, 2) AS bucket
        FROM counts, unnest(range(0, {_CM_DEPTH})) AS r(j)
    ), sketch AS (
        SELECT j, bucket, CAST(sum(n) AS BIGINT) AS c
        FROM buckets GROUP BY j, bucket
    ), topk AS (
        SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {_CM_TOPK}
    )
    SELECT tk.token, CAST(tk.n AS BIGINT) AS true_n,
           CAST(min(s.c) AS BIGINT) AS est_n
    FROM topk tk
    JOIN buckets b ON b.token = tk.token
    JOIN sketch s ON s.j = b.j AND s.bucket = b.bucket
    GROUP BY tk.token, tk.n
    ORDER BY true_n DESC, tk.token
    """,
)
def agg_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus token counts ({_CM_DEPTH}×256
    cells), read back at the exact top-{_CM_TOPK} tokens: (token,
    true_n, est_n) with est_n ≥ true_n guaranteed by construction —
    the one-sided CM bound, here exact-checkable because every hash is
    a 2-hex-char md5 slice both engines compute identically.

    The sketch is the mergeable-summary shape ClickHouse serves with
    -State/-Merge combinators: cell-wise-additive, constant-size
    (≤ {_CM_DEPTH}×256 rows regardless of corpus size), built from the
    token-count aggregate (equivalent to per-occurrence increments,
    one shuffle cheaper). Estimates broadcast the KB-scale sketch back
    to the top-k rows. At 100 TB: one map-side-combined shuffle on
    distinct tokens; everything after is constant-size.
    """
    docs = catalog.load(spark, sf_dir, "documents").where(F.length("text") > 0)
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h = F.md5(F.col("token").cast("binary"))
    slices = F.array(*[F.substring(h, 2 * j + 1, 2) for j in range(_CM_DEPTH)])
    buckets = counts.select(
        "token", "n", F.posexplode(slices).alias("j", "bucket")
    )
    sketch = buckets.groupBy("j", "bucket").agg(F.sum("n").cast("bigint").alias("c"))
    topk = counts.orderBy(F.col("n").desc(), "token").limit(_CM_TOPK)
    top_buckets = topk.select(
        "token", "n", F.posexplode(slices).alias("j", "bucket")
    )
    return (
        top_buckets.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("token", "n")
        .agg(F.min("c").alias("est_n"))
        .select("token", F.col("n").cast("bigint").alias("true_n"), "est_n")
        .orderBy(F.col("true_n").desc(), "token")
    )


# ---------------------------------------------------------------------------
# Weighted bottom-k sampling — deterministic priority sampling where a
# weight-w item gets w salted draws and the corpus keeps the k smallest.

_WB_K = 25
_WB_WMAX = 4


@register(
    "sample_weighted_bottomk",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               1 + (CAST(substr(source, 4) AS INT) % {_WB_WMAX}) AS weight
        FROM documents
    ), keyed AS (
        SELECT doc_id, source, weight,
               list_min(list_transform(range(0, weight),
                   j -> md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))
               )) AS rank_key
        FROM d
    )
    SELECT doc_id, source, CAST(weight AS BIGINT) AS weight, rank_key
    FROM keyed ORDER BY rank_key LIMIT {_WB_K}
    """,
)
def sample_weighted_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted bottom-{_WB_K} sample: a weight-w
    document enters w salted md5 draws and its rank key is the
    lexicographic minimum; the sample is the k smallest rank keys
    corpus-wide. Inclusion probability amplifies with weight (the
    min of w uniform draws stochastically dominates fewer draws) while
    staying a pure function of (doc_id, weight) — rerun-, engine-, and
    backfill-stable like `pipeline_mix_weighted`, and the weighted
    sibling of `sample_stratified_hash`.

    ZERO shuffles: the ≤{_WB_WMAX} candidate hashes are built in-row
    and collapsed by `array_min` (codegen, hex strings compare as
    ASCII — no floats, no base conversion), and the global bottom-k is
    TakeOrderedAndProject: every task keeps k rows, the driver merges
    heaps. Bottom-k sketches merge by union+truncate, so per-partition
    samples compose into the corpus sample — the distributed weighted
    priority-sampling primitive. Weights here derive from the source
    band (1..{_WB_WMAX}); any bounded-integer weight column slots in.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    weight = (
        F.lit(1) + F.expr("substring(source, 4)").cast("int") % _WB_WMAX
    ).alias("weight")
    draws = F.array(
        *[
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.lit(str(j))
                ).cast("binary")
            )
            for j in range(_WB_WMAX)
        ]
    )
    keyed = docs.select(
        "doc_id",
        "source",
        weight,
    ).select(
        "doc_id",
        "source",
        F.col("weight").cast("bigint").alias("weight"),
        F.array_min(F.slice(draws, 1, F.col("weight").cast("int"))).alias("rank_key"),
    )
    return keyed.orderBy("rank_key").limit(_WB_K)


# ---------------------------------------------------------------------------
# HyperLogLog with an EXACT cross-engine construction — the md5 hash
# domain and a dyadic-integer harmonic sum remove every source of
# engine divergence that forces `agg_hll_sketch_merge` to a rows-only
# contract.

_HLL_M = 256  # buckets (first 2 hex chars)
_HLL_SHIFT = 40  # dyadic scale: harmonic term = 2^(40 - rank), exact in int64
# alpha_256 * m^2 * 2^40, precomputed once so BOTH engines parse the
# same double literal and perform exactly ONE float op (the division):
_HLL_NUM = 5.175699493294551e+16
# hex digit -> extra leading zero bits within the digit (d >= 8 -> 0,
# 4..7 -> 1, 2..3 -> 2, 1 -> 3); ASCII order of 0-9a-f matches numeric
# order so plain string comparison implements the CASE identically.
_HLL_RANK_SQL = """
           CASE WHEN lead0 = 8 THEN 33
                ELSE 4 * lead0
                     + (CASE WHEN digit >= '8' THEN 0
                             WHEN digit >= '4' THEN 1
                             WHEN digit >= '2' THEN 2
                             ELSE 3 END) + 1 END
"""


@register(
    "agg_hll_dyadic_exact",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) || ':' ||
               CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS VARCHAR)
               AS item
        FROM events
    ), hashed AS (
        SELECT substr(md5(item), 1, 2) AS bucket,
               length(regexp_extract(substr(md5(item), 3, 8), '^(0*)', 1))
                   AS lead0,
               substr(substr(md5(item), 3, 8),
                      length(regexp_extract(substr(md5(item), 3, 8),
                                            '^(0*)', 1)) + 1, 1) AS digit
        FROM items
    ), ranked AS (
        SELECT bucket, max({_HLL_RANK_SQL}) AS mrank
        FROM hashed GROUP BY bucket
    ), state AS (
        SELECT count(*) AS n_present,
               CAST(sum(1::BIGINT << ({_HLL_SHIFT} - mrank)) AS BIGINT)
                   AS harm_present
        FROM ranked
    ), folded AS (
        SELECT n_present,
               harm_present
               + ({_HLL_M} - n_present) * (1::BIGINT << {_HLL_SHIFT})
                   AS harm
        FROM state
    )
    SELECT (SELECT count(*) FROM items) AS true_n,
           CAST(n_present AS BIGINT) AS nonzero_buckets,
           harm,
           round({_HLL_NUM!r} / harm, 2) AS est
    FROM folded
    """,
)
def agg_hll_dyadic_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct count of (user, day) presence with a fully
    EXACT cross-engine construction — the upgrade path for
    `agg_hll_sketch_merge`'s rows-only contract. Three divergence
    sources are engineered out:

    1. the hash is md5 (identical in both engines), bucket = first 2
       hex chars, rank = leading-zero count of the next 32-bit window
       computed by STRING operations (regexp leading-'0' count + one
       hex-digit CASE via ASCII compare) — integers end to end;
    2. the harmonic sum Σ 2^(-M_b) is scaled by 2^{_HLL_SHIFT} into a
       dyadic INTEGER (shiftleft, exact in int64 — no float sum, no
       addition-order sensitivity); empty buckets fold in as a closed
       form from the present-bucket count;
    3. the estimate performs exactly ONE float operation — a single
       division of the precomputed α·m²·2^{_HLL_SHIFT} literal by the
       exact integer harmonic — which IEEE 754 defines bit-exactly.

    The sketch is the classic mergeable shape: per-partition partial
    max-per-bucket (Spark's map-side partial aggregation IS the
    sketch merge), final state 256 integers. True cardinality (~4.5k
    at sf0.01) sits in HLL's uncorrected range (> 2.5m = 640), so the
    raw estimator applies without bias branches; observed |est −
    true|/true ≈ 2–5%, within the 1.04/√m ≈ 6.5% rms bound. At 100 TB
    the distinct shuffle dominates; the sketch itself is 256 rows.
    """
    ev = catalog.load(spark, sf_dir, "events")
    day = (catalog.ts_epoch_s(ev) / F.lit(86400)).cast("long")
    items = (
        ev.select(
            F.concat(
                F.col("user_id").cast("string"), F.lit(":"), day.cast("string")
            ).alias("item")
        )
        .distinct()
    )
    h = F.md5(F.col("item").cast("binary"))
    hashed = items.select(
        F.substring(h, 1, 2).alias("bucket"),
        F.substring(h, 3, 8).alias("h8"),
    ).select(
        "bucket",
        F.expr("length(regexp_extract(h8, '^(0*)', 1))").alias("lead0"),
        F.expr(
            "substr(h8, length(regexp_extract(h8, '^(0*)', 1)) + 1, 1)"
        ).alias("digit"),
    )
    rank = F.when(F.col("lead0") == 8, F.lit(33)).otherwise(
        4 * F.col("lead0")
        + F.when(F.col("digit") >= "8", 0)
        .when(F.col("digit") >= "4", 1)
        .when(F.col("digit") >= "2", 2)
        .otherwise(3)
        + 1
    )
    ranked = hashed.groupBy("bucket").agg(F.max(rank).alias("mrank"))
    state = ranked.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, {_HLL_SHIFT} - mrank)")).alias("harm_present"),
    )
    n_items = items.agg(F.count(F.lit(1)).alias("true_n"))
    harm = (
        F.col("harm_present")
        + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(1 << _HLL_SHIFT)
    ).cast("bigint")
    return (
        state.crossJoin(F.broadcast(n_items))
        .select(
            "true_n",
            F.col("n_present").cast("bigint").alias("nonzero_buckets"),
            harm.alias("harm"),
            F.round(F.lit(_HLL_NUM) / harm, 2).alias("est"),
        )
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k) theta sketch with set-operation estimates — uniqTheta
# territory: distinct counts AND intersection cardinality from k-sized
# mergeable sketches, never a pairwise user-list join.

_KMV_K = 64
_KMV_SALTS = 32  # phase-1 parallelism for the per-segment bottom-k
# DuckDB has no conv(); reconstruct the 32-bit int from 8 hex digits the
# established minhash-oracle way (strpos is 1-based; -1 maps '0'->0).
_H32_SQL = (
    "CAST(list_sum(list_transform(range(1, 9), "
    "j -> (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1) "
    "* CAST(16 ** (8 - j) AS BIGINT))) AS BIGINT)"
)


@register(
    "agg_kmv_intersect",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT
               CASE WHEN event_type = 'purchase' THEN 'A' ELSE 'B' END AS seg,
               user_id
        FROM events WHERE event_type IN ('purchase', 'error')
    ), hs AS (
        SELECT DISTINCT seg, {_H32_SQL} AS h FROM members
    ), sk AS (
        SELECT seg, h FROM hs
        QUALIFY row_number() OVER (PARTITION BY seg ORDER BY h) <= {_KMV_K}
    ), seg_est AS (
        SELECT seg, count(*) AS n_sk, max(h) AS kth
        FROM sk GROUP BY seg
    ), uh AS (
        SELECT DISTINCT h FROM sk
    ), usk AS (
        -- distinct FIRST (separate CTE): DuckDB evaluates QUALIFY
        -- before DISTINCT, so a combined form ranks duplicate hashes
        -- and truncates the union sketch to k/2 when A ≈ B
        SELECT h FROM uh
        QUALIFY row_number() OVER (ORDER BY h) <= {_KMV_K}
    ), u_est AS (
        SELECT count(*) AS n_u, max(h) AS kth_u,
               sum(CASE WHEN h IN (SELECT h FROM sk WHERE seg = 'A')
                         AND h IN (SELECT h FROM sk WHERE seg = 'B')
                        THEN 1 ELSE 0 END) AS n_both
        FROM usk
    ), truth AS (
        SELECT count(DISTINCT user_id) FILTER (WHERE seg = 'A') AS true_a,
               count(DISTINCT user_id) FILTER (WHERE seg = 'B') AS true_b,
               count(DISTINCT user_id) AS true_union
        FROM members
    ), truth_i AS (
        SELECT count(*) AS true_inter FROM (
            SELECT user_id FROM members GROUP BY user_id HAVING count(*) = 2
        )
    )
    SELECT t.true_a, t.true_b, t.true_union,
           CAST(ti.true_inter AS BIGINT) AS true_inter,
           round(CASE WHEN a.n_sk < {_KMV_K} THEN CAST(a.n_sk AS DOUBLE)
                      ELSE ({_KMV_K} - 1) * 4294967296.0 / a.kth END, 2) AS est_a,
           round(CASE WHEN b.n_sk < {_KMV_K} THEN CAST(b.n_sk AS DOUBLE)
                      ELSE ({_KMV_K} - 1) * 4294967296.0 / b.kth END, 2) AS est_b,
           round(CASE WHEN u.n_u < {_KMV_K} THEN CAST(u.n_u AS DOUBLE)
                      ELSE ({_KMV_K} - 1) * 4294967296.0 / u.kth_u END, 2) AS est_union,
           round(u.n_both * (CASE WHEN u.n_u < {_KMV_K} THEN CAST(u.n_u AS DOUBLE)
                                  ELSE ({_KMV_K} - 1) * 4294967296.0 / u.kth_u END)
                 / u.n_u, 2) AS est_inter
    FROM truth t, truth_i ti, u_est u,
         (SELECT * FROM seg_est WHERE seg = 'A') a,
         (SELECT * FROM seg_est WHERE seg = 'B') b
    """,
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) sketches over two user
    segments (A = purchasers, B = error-hitters) with distinct-count
    AND intersection estimates — the uniqTheta answer to "how many
    users are in both segments" that never joins user lists. Exactly
    cross-engine-checkable like the other sketches here: hashes are
    md5-derived 32-bit ints, the k-th minimum is an integer, and each
    estimate is (k−1)·2³²/kth — integer inputs into one IEEE-defined
    float expression (sub-k segments fall back to their exact size).

    Sketch algebra under test: bottom-k(A ∪ B) = bottom-k(bottom-k(A)
    ∪ bottom-k(B)) — the union sketch derives from the two segment
    sketches alone, and the intersection estimate is the classic
    (matches in union sketch)/k × union estimate. At scale the
    per-segment bottom-k runs salted two-phase (window rank ≤ k inside
    {_KMV_SALTS} salt slices → merge the ≤{_KMV_SALTS}·k survivors),
    so no task ever sorts a whole segment; a production build would
    swap the rank step for a bounded k-heap accumulator, same
    algebra. Everything after phase 1 is ≤ a few hundred rows.
    """
    ev = catalog.load(spark, sf_dir, "events")
    members = (
        ev.where(F.col("event_type").isin("purchase", "error"))
        .select(
            F.when(F.col("event_type") == "purchase", "A").otherwise("B").alias("seg"),
            "user_id",
        )
        .distinct()
    )
    h32 = F.expr(
        "CAST(conv(substr(md5(CAST(CAST(user_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"
    )
    hs = members.select("seg", h32.alias("h")).distinct()
    w_salt = Window.partitionBy("seg", F.pmod("h", F.lit(_KMV_SALTS))).orderBy("h")
    survivors = hs.withColumn("_rn", F.row_number().over(w_salt)).where(
        F.col("_rn") <= _KMV_K
    )
    w_seg = Window.partitionBy("seg").orderBy("h")
    sk = (
        survivors.withColumn("_rk", F.row_number().over(w_seg))
        .where(F.col("_rk") <= _KMV_K)
        .select("seg", "h")
    )
    seg_est = sk.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("kth")
    )
    in_a = sk.where(F.col("seg") == "A").select(F.col("h").alias("h_a"))
    in_b = sk.where(F.col("seg") == "B").select(F.col("h").alias("h_b"))
    w_u = Window.orderBy("h")
    usk = (
        sk.select("h")
        .distinct()
        .withColumn("_ru", F.row_number().over(w_u))
        .where(F.col("_ru") <= _KMV_K)
        .join(F.broadcast(in_a), F.col("h") == F.col("h_a"), "left")
        .join(F.broadcast(in_b), F.col("h") == F.col("h_b"), "left")
    )
    u_est = usk.agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max("h").alias("kth_u"),
        F.sum(
            F.when(F.col("h_a").isNotNull() & F.col("h_b").isNotNull(), 1).otherwise(0)
        ).alias("n_both"),
    )
    truth = members.agg(
        F.countDistinct(F.when(F.col("seg") == "A", F.col("user_id"))).alias("true_a"),
        F.countDistinct(F.when(F.col("seg") == "B", F.col("user_id"))).alias("true_b"),
        F.countDistinct("user_id").alias("true_union"),
    )
    truth_i = (
        members.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_inter"))
    )

    def est(n_col: str, kth_col: str):
        return F.when(
            F.col(n_col) < _KMV_K, F.col(n_col).cast("double")
        ).otherwise(F.lit(float(_KMV_K - 1)) * F.lit(4294967296.0) / F.col(kth_col))

    a = seg_est.where(F.col("seg") == "A").select(
        F.col("n_sk").alias("na"), F.col("kth").alias("ka")
    )
    b = seg_est.where(F.col("seg") == "B").select(
        F.col("n_sk").alias("nb"), F.col("kth").alias("kb")
    )
    return (
        truth.crossJoin(F.broadcast(truth_i))
        .crossJoin(F.broadcast(u_est))
        .crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .select(
            "true_a",
            "true_b",
            "true_union",
            "true_inter",
            F.round(est("na", "ka"), 2).alias("est_a"),
            F.round(est("nb", "kb"), 2).alias("est_b"),
            F.round(est("n_u", "kth_u"), 2).alias("est_union"),
            F.round(
                F.col("n_both") * est("n_u", "kth_u") / F.col("n_u"), 2
            ).alias("est_inter"),
        )
    )
