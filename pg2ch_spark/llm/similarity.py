"""Group K (vectors) — similarity search over embeddings (SURVEY §2.3 K).

Vector math is built from higher-order functions (`zip_with`,
`transform`, `aggregate`) — JVM-side, codegen'd, no UDF (SURVEY §4.3.3).
Elements are float32 in parquet; both engines cast each element to
double *before* multiplying and reduce sequentially, so the resulting
doubles are bit-identical and 4dp rounding is stable.

Scale notes (100 TB / billions of vectors):
- ``sim_cosine_topk`` is brute force with a broadcast single query
  vector → one scan, local top-k, TakeOrderedAndProject merge. That is
  the right plan for one query at any scale.
- ``sim_knn_join`` broadcasts the (small) query set against the corpus
  — a scan×20 flops job with no shuffle of the corpus. For large query
  sets the scale path is IVF: cluster-assign both sides (as in
  ``sim_centroid_classify``), equi-join on cluster id, search within
  the bucket — same operators, one extra groupBy.
- ``sim_centroid_classify`` *is* the IVF building block: centroids via
  posexplode + per-dimension avg (partial agg), assignment via a
  broadcast join on 10 centroids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

EMB_DIM = 64  # fixed at all scale factors (FIXTURES.md, verified)


def _dot_expr(a: str, b: str, dim: int) -> str:
    """SQL text for Σ aᵢ·bᵢ with per-element double casts.

    Unrolled over the known dimension instead of `aggregate(zip_with(…))`:
    the HOF lambda is evaluated interpreted (per-element closure calls),
    while a 64-term expression tree is whole-stage-codegen'd — measured
    ~20× faster on the all-pairs near-dup scan. Built as ONE SQL string
    (single py4j call): constructing the same tree from ~600 Column
    objects costs ~1 s of driver time per query. `+` parses
    left-associative, so the addition order is bit-identical to the HOF
    fold (0.0 + t₁ + t₂ …) and to DuckDB's `list_sum(list_transform…)`,
    and 4dp rounding agrees across engines.
    """
    return " + ".join(
        f"(CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({b}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    )


def dot(a: str, b: str, dim: int = EMB_DIM) -> Column:
    """Σ aᵢ·bᵢ — sequential left-fold, codegen'd (see `_dot_expr`)."""
    return F.expr(_dot_expr(a, b, dim))


def l2_norm(a: str, dim: int = EMB_DIM) -> Column:
    return F.expr(f"sqrt({_dot_expr(a, a, dim)})")


def cosine(a: str, b: str, dim: int = EMB_DIM) -> Column:
    # try_divide, not /: Spark 4 runs ANSI mode, where a zero-norm
    # vector's 0/0 THROWS DIVIDE_BY_ZERO and kills the whole job;
    # DuckDB (and the oracles) yield NULL, which every >= / ORDER BY
    # downstream drops or ranks last. One hostile row must degrade,
    # not abort a 100 TB scan.
    return F.expr(
        f"try_divide({_dot_expr(a, b, dim)}, "
        f"sqrt({_dot_expr(a, a, dim)}) * sqrt({_dot_expr(b, b, dim)}))"
    )


# HOF (aggregate/zip_with) forms of the same math, same sequential fold
# order (0.0 + t₁ + t₂ …) so results are bit-identical to the unrolled
# expression and the DuckDB oracle. Trade-off, measured at sf0.1 ×200
# (400k rows × 64 dims, local[8]): per-row eval is EQUAL to the
# unrolled tree (~8 M rows/s both — zip_with over primitive float
# arrays stays cheap in Spark 4), but the unrolled tree pays ~1.5-4 s
# of one-time Janino compile for its ~200-term method while the HOF
# plan compiles in ~0.1 s. So: single-pass scans (one cosine per row —
# topk, knn) use the HOF form (fixed cost dominates); the all-pairs /
# candidate-verify paths in neardup.py keep the unrolled form, where
# its per-candidate edge inside join conditions amortizes the compile.
def _hof_dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def _hof_norm(a: str) -> Column:
    return F.expr(
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v))"
    )


# DuckDB-side equivalents (explicit math, same double casts and order —
# list_cosine_similarity would compute in float32 and diverge at 4dp).
_DOT_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM_SQL = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_DOT_SQL.format(a=a, b=b)} / ({_NORM_SQL.format(a=a)} * {_NORM_SQL.format(a=b)})"
    )


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, round({_cos_sql('e.embedding', 'q.qe')}, 4) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id != 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest to vec_id=0 by (rounded cosine DESC, vec_id).

    Plan: broadcast the 1-row query side WITH its norm precomputed (a
    per-query constant — no reason to recompute it per corpus row),
    HOF dot/norm per row, TakeOrderedAndProject merge. One corpus scan,
    no shuffle — the right brute-force plan for one query at any scale.
    """
    e = catalog.load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), _hof_norm("embedding").alias("_nq")
    )
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            # try_divide: ANSI-safe on zero-norm rows (NULL like the
            # oracle, ranked last by desc's default nulls-last)
            F.round(
                F.try_divide(
                    _hof_dot("embedding", "qe"),
                    _hof_norm("embedding") * F.col("_nq"),
                ),
                4,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "sim_knn_join",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 20),
    pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round({_cos_sql('e.embedding', 'q.qe')}, 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM pairs
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) <= 3
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: top-3 neighbors for each of 20 query vectors."""
    e = catalog.load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _hof_norm("embedding").alias("_nq"),  # per-query constant
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.try_divide(
                    _hof_dot("embedding", "qe"),
                    _hof_norm("embedding") * F.col("_nq"),
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register(
    "sim_centroid_classify",
    oracle=f"""
    WITH pos AS (SELECT unnest(range(1, {EMB_DIM} + 1)) AS pos),
    ex AS (
        SELECT e.vec_id, e.label, p.pos, CAST(e.embedding[p.pos] AS DOUBLE) AS val
        FROM embeddings e, pos p
    ), cent AS (
        SELECT label AS clabel, pos, avg(val) AS cval FROM ex GROUP BY label, pos
    ), d AS (
        SELECT ex.vec_id, ex.label, c.clabel,
               round(sum((ex.val - c.cval) * (ex.val - c.cval)), 6) AS dist2
        FROM ex JOIN cent c ON ex.pos = c.pos
        GROUP BY ex.vec_id, ex.label, c.clabel
    ), pred AS (
        SELECT vec_id, label, clabel FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, clabel) = 1
    )
    SELECT label, clabel AS pred_label, count(*) AS n
    FROM pred GROUP BY label, clabel
    """,
)
def sim_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label centroids → nearest-centroid prediction → confusion counts.

    The IVF building block: per-dimension centroid averages (posexplode
    + partial agg), broadcast-join assignment, integer-only output so
    the tiny float drift between engines' centroid sums can't surface
    (distances are rounded before the argmin rank).
    """
    e = catalog.load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val_f"),
    ).select("vec_id", "label", (F.col("pos") + 1).alias("pos"), F.col("val_f").cast("double").alias("val"))
    cent = ex.groupBy(F.col("label").alias("clabel"), "pos").agg(F.avg("val").alias("cval"))
    d = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))), 6
            ).alias("dist2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "clabel")
    pred = d.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return pred.groupBy("label", F.col("clabel").alias("pred_label")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "multimodal_join",
    oracle="""
    SELECT d.doc_id, e.label, d.n_chars
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.lang = 'en'
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ embedding modalities on the shared id (doc_id = vec_id)."""
    d = catalog.load(spark, sf_dir, "documents")
    e = catalog.load(spark, sf_dir, "embeddings")
    return (
        d.where(F.col("lang") == "en")
        .join(e, d.doc_id == e.vec_id)
        .select("doc_id", "label", "n_chars")
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation eval — how much retrieval quality survives
# cutting the embedding to its prefix dims (MRL-style deployments keep
# one 64-dim index and serve 8/16/32-dim truncations for cheap tiers).

_MAT_DIMS = (8, 16, 32, 64)
_MAT_QUERIES = 10
_MAT_TOPK = 10


@register(
    "sim_matryoshka_recall",
    oracle=f"""
    WITH ks AS (SELECT unnest(ARRAY{list(_MAT_DIMS)}) AS k),
    q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < {_MAT_QUERIES}
    ),
    pairs AS (
        SELECT ks.k, q.query_id, e.vec_id AS neighbor_id,
               round(
                 list_sum(list_transform(range(1, ks.k + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, ks.k + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, ks.k + 1),
                      i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))),
                 4) AS cos_sim
        FROM embeddings e, q, ks
        WHERE e.vec_id != q.query_id
    ),
    tops AS (
        SELECT k, query_id, neighbor_id FROM pairs
        QUALIFY row_number() OVER (PARTITION BY k, query_id
                                   ORDER BY cos_sim DESC, neighbor_id)
                <= {_MAT_TOPK}
    ),
    base AS (SELECT query_id, neighbor_id FROM tops WHERE k = {EMB_DIM}),
    hits AS (
        SELECT t.k, t.query_id, count(b.neighbor_id) AS n_hit
        FROM tops t
        LEFT JOIN base b ON b.query_id = t.query_id
                        AND b.neighbor_id = t.neighbor_id
        GROUP BY t.k, t.query_id
    )
    SELECT CAST(k AS BIGINT) AS k,
           round(avg(CAST(n_hit AS DOUBLE)) / {_MAT_TOPK}, 4) AS recall_at_{_MAT_TOPK}
    FROM hits GROUP BY k ORDER BY k
    """,
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_MAT_TOPK} of prefix-truncated embeddings vs the full
    {EMB_DIM}-dim ranking, per truncation width k ∈ {_MAT_DIMS} — the
    eval that decides which Matryoshka serving tier is safe. The k =
    {EMB_DIM} row is the identity sanity check (recall 1.0).

    One pass computes every tier: the corpus crossJoins the broadcast
    ({_MAT_QUERIES} queries × |ks| widths) side — each corpus row is
    scanned ONCE and sliced in-row per (query, k), so the plan is the
    `sim_knn_join` broadcast shape with a 4× wider flop budget, not 4
    scans. Truncated cosines renormalize over the prefix (slice, then
    the same double-cast sequential fold both engines share); per-tier
    top-k via one window over (k, query); recall joins each tier's
    list against the k={EMB_DIM} baseline with a broadcast semi-count.
    At billions of vectors this stays a single corpus scan + one
    window shuffle on (k, query, cos) — the eval never re-reads the
    index."""
    e = catalog.load(spark, sf_dir, "embeddings")
    ks = spark.range(0, len(_MAT_DIMS)).select(
        F.element_at(F.array(*[F.lit(k) for k in _MAT_DIMS]), (F.col("id") + 1).cast("int")).alias("k")
    )
    q = (
        e.where(F.col("vec_id") < _MAT_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
        .crossJoin(ks)
        .select("query_id", "k", F.slice("qe", 1, F.col("k")).alias("qe"))
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "k",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.try_divide(
                    _hof_dot("slice(embedding, 1, k)", "qe"),
                    _hof_norm("slice(embedding, 1, k)") * _hof_norm("qe"),
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("k", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    tops = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= _MAT_TOPK)
        .select("k", "query_id", "neighbor_id")
    )
    # Baseline membership WITHOUT a self-join (a join against the
    # k=EMB_DIM slice would recompute the whole corpus pass for the
    # build side): a window over (query, neighbor) spans all tiers'
    # rows at once, so "is this neighbor in the full-dim top-k" is a
    # max-of-flag over the group — one pass, no second scan.
    w_pair = Window.partitionBy("query_id", "neighbor_id")
    hits = (
        tops.withColumn(
            "in_base",
            F.max(F.when(F.col("k") == EMB_DIM, 1).otherwise(0)).over(w_pair),
        )
        .groupBy("k", "query_id")
        .agg(F.sum("in_base").alias("n_hit"))
    )
    return (
        hits.groupBy("k")
        .agg(
            F.round(F.avg(F.col("n_hit").cast("double")) / _MAT_TOPK, 4).alias(
                f"recall_at_{_MAT_TOPK}"
            )
        )
        .select(F.col("k").cast("bigint").alias("k"), f"recall_at_{_MAT_TOPK}")
        .orderBy("k")
    )
