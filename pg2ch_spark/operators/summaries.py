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
from pyspark.sql import DataFrame, SparkSession

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
        F.lit(1) + F.substring("source", 4, 10).cast("int") % _WB_WMAX
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
