"""Round-2 extensions (SURVEY §2.3 addendum): hyperplane-LSH embedding
near-dup (the declared scale path for `sim_near_dup_embedding`, now a
first-class operator with an exact oracle), exact interpolated
percentiles, rank-distribution windows, and an event funnel.

Registered LAST (registry.load_all) so the externally-unverified r1
groups keep their early registration slots.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.caching import fanout_partitions
from pg2ch_spark.registry import register

# ---------------------------------------------------------------------------
# Random-hyperplane LSH near-dup — approximate sibling of
# sim_near_dup_embedding: vectors only meet when ALL signature bits
# agree, turning the all-pairs scan into a bucket equi-join.

_N_PLANES = 16
_N_BANDS = 4  # 4 bands × 4 planes: P(collide in ≥1 band) ≈ 0.96 at cos 0.9
_DIM = 64
_LSH_COS_MIN = 0.45


def _hyperplanes() -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — a fixed constant, inlined
    into BOTH the Spark expression and the oracle SQL (signs are not
    data-derived, so cross-engine identity is by construction)."""
    return [
        [
            1.0 if hashlib.md5(f"h{p}:{d}".encode()).digest()[0] & 1 else -1.0
            for d in range(_DIM)
        ]
        for p in range(_N_PLANES)
    ]


_PLANES = _hyperplanes()


def _oracle_lsh() -> str:
    plane_rows = ",\n            ".join(
        f"({p}, {_PLANES[p]})" for p in range(_N_PLANES)
    )
    return f"""
    WITH planes(p, h) AS (VALUES
            {plane_rows}
    ),
    bits AS (
        SELECT e.vec_id, pl.p // {_N_PLANES // _N_BANDS} AS band,
               CASE WHEN list_sum(list_transform(range(1, {_DIM + 1}),
                                  i -> CAST(e.embedding[i] AS DOUBLE) * pl.h[i])) > 0
                    THEN 1 << (pl.p % {_N_PLANES // _N_BANDS}) ELSE 0 END AS bit
        FROM embeddings e, planes pl
    ),
    sig AS (
        SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS bval
        FROM bits GROUP BY vec_id, band
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           round(list_sum(list_transform(range(1, {_DIM + 1}),
                          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, {_DIM + 1}),
                          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, {_DIM + 1}),
                          i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))))),
                 4) AS cos_sim
    FROM cand c
    JOIN embeddings x ON x.vec_id = c.vec_a
    JOIN embeddings y ON y.vec_id = c.vec_b
    WHERE round(list_sum(list_transform(range(1, {_DIM + 1}),
                          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, {_DIM + 1}),
                          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, {_DIM + 1}),
                          i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))))),
                 4) >= {_LSH_COS_MIN}
    """


@register("sim_lsh_hyperplane", oracle=_oracle_lsh())
def sim_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-dup: 16 sign bits in 4 bands of 4 —
    candidates must agree on at least one FULL band (union of band
    equi-joins, the same shuffle-friendly shape as the SimHash LSH) —
    then exact cosine on candidates only.

    This is the scale path `sim_near_dup_embedding`'s docstring
    promises: at billions of vectors the all-pairs tile scan becomes a
    shuffle on band keys (collision ≈ 0.96 at cos 0.9, tunable by band
    count; a single 16-bit bucket finds nothing even at sf0.01).
    Signatures are in-row zip_with folds against CONSTANT ±1
    hyperplanes — same left-to-right order as the oracle's list_sum,
    so every sign (and thus every bucket) is bit-identical.

    Exact-dup collapsed (round 5) like the text near-dup family:
    signatures and cosine are pure functions of the vector bytes, so
    bucketing + the in-bucket tile kernel run over one representative
    per DISTINCT vector and member products expand exactly afterwards
    (identical vectors share every band and score cos 1.0). Without
    this a duplicate-dense corpus goes quadratic inside every bucket —
    the 100× replication probe (100 copies of each vector) put ~12k
    rows in each of the 64 (band, value) buckets and the dense
    per-bucket cos matrix GC-thrashed; post-collapse the kernel cost
    is base-scale and the expansion is true-output-sized.
    """
    from pg2ch_spark.llm.neardup import _collapse_on

    e = catalog.load(spark, sf_dir, "embeddings")
    # md5 of the JSON bytes, not groupBy(embedding): the shuffle then
    # carries 16-byte keys and one vector per distinct value survives
    # the partial agg — the payload never fans out.
    eclusters = _collapse_on(
        e.select("vec_id", "embedding"),
        "vec_id",
        F.md5(F.to_json("embedding").cast("binary")),
        ("embedding",),
    )
    e = eclusters.select(F.col("rep").alias("vec_id"), "embedding")
    bits_per_band = _N_PLANES // _N_BANDS
    band_exprs = []
    for band in range(_N_BANDS):
        terms = []
        for j in range(bits_per_band):
            p = band * bits_per_band + j
            # HOF fold, NOT the unrolled form similarity.py uses for
            # cosine: 16 sign dots in ONE projection are ~4k expression
            # nodes — past the codegen method-size limit, so the
            # unrolled form falls back to interpreted eval and measures
            # 0.55s vs 0.19s for the HOF loop (sf0.1, warm). The fold
            # order still matches the oracle's list_sum left-to-right.
            arr = "array(" + ", ".join(f"{v}D" for v in _PLANES[p]) + ")"
            terms.append(
                f"CASE WHEN aggregate(zip_with(embedding, {arr},"
                f" (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (a, b) -> a + b) > 0"
                f" THEN {1 << j}L ELSE 0L END"
            )
        band_exprs.append(F.expr(" + ".join(terms)).alias(f"bv{band}"))
    # The repartition spreads the single-split fixture across cores:
    # the 16 sign folds are interpreted HOFs (~1k lambda evals/row),
    # the per-row hot loop here (input splits provide the spread for
    # free at real scale).
    sig = e.repartition(fanout_partitions(e)).select("vec_id", "embedding", *band_exprs)

    # Verification happens INSIDE each (band, value) bucket with the
    # same bit-exact numpy tile kernel as sim_near_dup_embedding —
    # embeddings shuffle once to their buckets and pairs never leave
    # them, instead of materializing |candidates| array-joined rows
    # (23% of all pairs at this similarity regime — hyperplane LSH
    # discriminates weakly when near means cos≈0.5). A pair whose
    # signature agrees on two bands is scored in both buckets with
    # bit-identical results, so the final distinct collapses it.
    import numpy as np
    import pandas as pd

    band_struct = ", ".join(f"struct({b} AS band, bv{b} AS bval)" for b in range(_N_BANDS))
    bands_long = sig.select(
        "vec_id",
        "embedding",
        F.explode(F.expr(f"array({band_struct})")).alias("bb"),
    ).select("vec_id", "embedding", "bb.band", "bb.bval")

    _empty = pd.DataFrame(
        {
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "c_raw": pd.Series(dtype="float64"),
        }
    )

    # Shared CHUNKED tile kernel (llm/neardup.py): a skewed (band,
    # value) bucket must never allocate its dense |bucket|² cosine
    # matrix — the slab is CHUNK × |bucket| and only pairs that can
    # round up to the declared threshold cross Arrow. The pre-filter
    # margin mirrors the JVM-side round(c, 4) >= threshold comparison;
    # NaN (zero-norm) drops in-kernel exactly like the ~isnan guard.
    from pg2ch_spark.llm.neardup import chunked_cos_pairs

    pre = _LSH_COS_MIN - 1e-4

    def bucket_pairs(key, pdf):
        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return _empty
        M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return chunked_cos_pairs(ids, M, ids, M, pre, upper_only=True)

    scored = bands_long.groupBy("band", "bval").applyInPandas(
        bucket_pairs, "vec_a long, vec_b long, c_raw double"
    )
    rep_pairs = (
        scored.select("vec_a", "vec_b", F.round("c_raw", 4).alias("cos_sim"))
        # isnan guard: a zero-norm vector lands in the bval=0 bucket of
        # every band and scores NaN against its bucket-mates; DuckDB's
        # 0/0 is NULL (dropped by >=) but Spark orders NaN ABOVE every
        # number, so a bare >= would keep the pair.
        .where(~F.isnan("cos_sim") & (F.col("cos_sim") >= _LSH_COS_MIN))
        .distinct()
    )

    # Expansion back to the per-vector contract. Within-cluster pairs
    # are identical vectors: every band agrees and cos is exactly 1.0 —
    # unless the vector is all-zero (0/0 is NULL in the oracle, so it
    # must pair with nothing), hence the positive-norm guard.
    from pg2ch_spark.llm.neardup import _expand_member_products

    # norm in (0, inf): zero-norm AND overflow-norm vectors pair with
    # nothing — see sim_near_dup_embedding for the NaN boundary rationale
    norm2 = F.expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x)")
    return _expand_member_products(
        rep_pairs,
        eclusters.select("rep", "members"),
        "vec_a",
        "vec_b",
        {"cos_sim": F.lit(1.0)},
        eligible=eclusters.where((norm2 > 0) & (norm2 < F.lit(float("inf")))),
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles (linear interpolation — both engines
# implement the SQL-standard continuous quantile)


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per return flag. `percentile` sorts
    within each group — at 100 TB switch to `approx_percentile` (KLL
    sketch, mergeable map-side) and accept the documented error bound;
    the exact form is the oracle-checkable contract."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            # one buffered pass for all three quantiles, not three
            F.expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.95D))").alias("ps"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 4).alias("p25"),
            F.round(F.col("ps")[1], 4).alias("p50"),
            F.round(F.col("ps")[2], 4).alias("p95"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Rank-distribution windows


@register(
    "win_pct_rank_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
)
def win_pct_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per priority class — the distribution
    ranks both engines define identically (SQL standard, tie-stable).

    PARTITION BY a 5-value priority key is 5 single-task sorts of the
    row set (the `win_topk_per_group` failure shape), so the ranks are
    computed the sharded two-pass way, extended for TIES because this
    ORDER BY carries no unique tiebreak:

    1. shard = trunc(o_totalprice/4096) — monotone in the order key, so
       ties (equal prices) can never straddle a shard boundary and
       (priority, shard)-local ranks lift to exact global ranks;
    2. per-(priority, shard) windows: F.rank() gives the tie-shared
       rank, a RANGE frame count gives rows-with-price ≤ current (the
       cume_dist numerator, ties included);
    3. offsets + per-priority totals ride one broadcast frame windowed
       over |priorities × shards| aggregate rows;
    4. closed forms: pr = (offset+rank−1)/(n_p−1), cd = (offset+cnt≤)/n_p.
    """
    o = (
        catalog.load(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 50)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn("_shard", (F.col("o_totalprice") / F.lit(4096.0)).cast("long"))
    )
    w_loc = Window.partitionBy("o_orderpriority", "_shard").orderBy("o_totalprice")
    w_le = w_loc.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    local = o.select(
        "o_orderkey",
        "o_orderpriority",
        "_shard",
        F.rank().over(w_loc).alias("_lrk"),
        F.count(F.lit(1)).over(w_le).alias("_lle"),
    )
    w_off = Window.partitionBy("o_orderpriority").orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_np = Window.partitionBy("o_orderpriority").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        o.groupBy("o_orderpriority", "_shard")
        .agg(F.count(F.lit(1)).alias("_srows"))
        .withColumn("_off", F.sum("_srows").over(w_off) - F.col("_srows"))
        .withColumn("_np", F.sum("_srows").over(w_np))
        .select("o_orderpriority", "_shard", "_off", "_np")
    )
    joined = local.join(F.broadcast(offsets), ["o_orderpriority", "_shard"])
    rk = F.col("_off") + F.col("_lrk")
    n_p = F.col("_np")
    return joined.select(
        "o_orderkey",
        "o_orderpriority",
        # percent_rank of a 1-row partition is 0 (not 0/0 — ANSI aborts)
        F.round(F.when(n_p > 1, (rk - 1) / (n_p - 1)).otherwise(F.lit(0.0)), 6).alias("pr"),
        F.round((F.col("_off") + F.col("_lle")) / n_p, 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Event funnel (signup → purchase within an hour)


@register(
    "events_funnel",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
    ),
    s AS (
        SELECT user_id, min(t) AS t_signup FROM e WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT s.user_id,
               max(CASE WHEN e.event_type = 'purchase'
                         AND e.t > s.t_signup AND e.t <= s.t_signup + 3600
                        THEN 1 ELSE 0 END) AS converted
        FROM s JOIN e USING (user_id)
        GROUP BY s.user_id
    )
    SELECT count(*) AS n_signed_up,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 4) AS conversion
    FROM conv
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup → purchase-within-1h funnel. Times floored to epoch
    seconds first (D3) so both engines compare identical integers; the
    per-user min-signup aggregate shuffles once on user_id and the
    conversion join reuses that partitioning."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("long").alias("t")
    )
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_signup"))
    )
    conv = (
        s.join(ev, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t") > F.col("t_signup"))
                    & (F.col("t") <= F.col("t_signup") + 3600),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(F.sum("converted").cast("double") / F.count(F.lit(1)), 4).alias("conversion"),
    )


# ---------------------------------------------------------------------------
# Multimodal frame sampling — row expansion through mapInPandas


_FRAME_BYTES = 16
_FRAME_STRIDE = 3  # keep every 3rd frame


@register(
    "multimodal_framesample",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, text, strlen(text) AS n_bytes
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id, CAST(k AS INT) AS frame_idx,
           md5(substr(text, k * {_FRAME_BYTES * _FRAME_STRIDE} + 1, {_FRAME_BYTES})) AS frame_hash
    FROM media, unnest(range(0, (n_bytes - 1) // {_FRAME_BYTES * _FRAME_STRIDE} + 1)) AS t(k)
    WHERE n_bytes > 0
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing: one binary payload row expands to
    every {stride}-th fixed-size frame inside mapInPandas (batch in →
    frame rows out, no per-row Python round trip). The frame *decode*
    is the documented fake — md5 of the frame characters stands in for
    a real codec (absent from this container, multimodal.decode_image) —
    so the expansion path, batch shape, and row alignment are exactly
    oracle-checked rather than row-counted.

    Scale: sampling runs where the payload lives; output carries the
    16-byte hash, not the frame, so the shuffle after sampling moves
    ~1% of the input bytes.
    """
    import hashlib

    import pandas as pd

    docs = catalog.load(spark, sf_dir, "documents")
    media = docs.where(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    step = _FRAME_BYTES * _FRAME_STRIDE

    def sample(batches):
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw:
                    continue
                # frame COUNT is byte-derived on both sides; frame
                # CONTENT walks characters like the oracle's substr
                # (identical on ASCII, aligned on any UTF-8 payload)
                chars = raw.decode("utf-8")
                for k in range((len(raw) - 1) // step + 1):
                    frame = chars[k * step : k * step + _FRAME_BYTES]
                    ids.append(mid)
                    idxs.append(k)
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return media.repartition(fanout_partitions(media)).mapInPandas(
        sample, "media_id long, frame_idx int, frame_hash string"
    )


# ---------------------------------------------------------------------------
# K-means quantizer training — the iterative algorithm behind a real IVF
# index (sim_ann_ivf uses per-label centroids as its stand-in quantizer)

_KM_K = 8
_KM_ITERS = 2


def _oracle_kmeans(tail: str | None = None) -> str:
    """Lloyd's algorithm unrolled — each iteration is one assign CTE +
    one recompute CTE, so the oracle is plain SQL. ``tail`` overrides
    the final SELECT (reused by sim_cluster_purity over the same
    unrolled chain)."""
    sql = f"""
    WITH ex AS (
        SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val
        FROM embeddings, unnest(range(1, 65)) AS t(pos)
    ),
    c0 AS (
        SELECT vec_id % {_KM_K} AS cl, pos, round(avg(val), 6) AS cval
        FROM ex GROUP BY 1, 2
    )"""
    prev = "c0"
    for it in range(1, _KM_ITERS + 1):
        sql += f""",
    d{it} AS (
        SELECT ex.vec_id, c.cl,
               round(sum((ex.val - c.cval) * (ex.val - c.cval)), 6) AS dist2
        FROM ex JOIN {prev} c USING (pos)
        GROUP BY 1, 2
    ),
    a{it} AS (
        SELECT vec_id, cl, dist2 FROM d{it}
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cl) = 1
    ),
    c{it} AS (
        SELECT a.cl, ex.pos, round(avg(ex.val), 6) AS cval
        FROM ex JOIN a{it} a USING (vec_id)
        GROUP BY 1, 2
    )"""
        prev = f"c{it}"
    if tail is None:
        tail = f"""
    SELECT cl AS cluster, count(*) AS n_members,
           round(sum(dist2), 2) AS inertia
    FROM a{_KM_ITERS} GROUP BY cl
    """
    sql += tail
    return sql


@register("sim_ann_kmeans_train", oracle=_oracle_kmeans())
def sim_ann_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train an IVF coarse quantizer with 2 unrolled Lloyd iterations:
    deterministic init (mean of vec_id % k residue classes), assign to
    nearest centroid by rounded squared distance, recompute per-dim
    means. Output: cluster sizes + inertia after the last assignment.

    Cross-engine exactness for an ITERATIVE float algorithm: centroids
    are rounded to 6dp after every recompute, so both engines feed
    bit-identical quantizers into the next iteration; distances round
    at 6dp (ties broken by cluster id) exactly as `sim_ann_ivf` does.
    The driver loop lives in Python but every step is a DataFrame op —
    at scale each iteration is two shuffles (assign broadcast-join +
    recompute agg), the canonical distributed-k-means plan; the
    centroid table (k×d rounded doubles) is what `sim_ann_ivf` would
    consume in place of its per-label stand-in.
    """
    return _kmeans_assignment(spark, sf_dir).groupBy(
        F.col("cl").alias("cluster")
    ).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.sum("dist2"), 2).alias("inertia"),
    )


def _kmeans_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared Lloyd loop: final (vec_id, cl, dist2) assignment
    after {_KM_ITERS} iterations — consumed by sim_ann_kmeans_train
    (sizes + inertia) and sim_cluster_purity (label agreement)."""
    e = catalog.load(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", F.posexplode("embedding").alias("p0", "val_f")).select(
        "vec_id", (F.col("p0") + 1).alias("pos"), F.col("val_f").cast("double").alias("val")
    )
    cent = (
        ex.withColumn("cl", F.col("vec_id") % _KM_K)
        .groupBy("cl", "pos")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
    )
    assign = None
    for _ in range(_KM_ITERS):
        cent_arr = (
            cent.groupBy("cl")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pc"))
            .select("cl", F.expr("transform(pc, x -> x.cval)").alias("cvals"))
        )
        d = e.crossJoin(F.broadcast(cent_arr)).select(
            "vec_id",
            "cl",
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, cvals,"
                    "                   (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
                    "          CAST(0 AS DOUBLE), (a, b) -> a + b)"
                ),
                6,
            ).alias("dist2"),
        )
        w = Window.partitionBy("vec_id").orderBy("dist2", "cl")
        assign = (
            d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("vec_id", "cl", "dist2")
            .localCheckpoint(eager=True)  # barrier: next iteration reads it twice
        )
        cent = ex.join(assign.select("vec_id", "cl"), "vec_id").groupBy("cl", "pos").agg(
            F.round(F.avg("val"), 6).alias("cval")
        )
    return assign


@register(
    "sim_cluster_purity",
    oracle=_oracle_kmeans(
        tail=f"""
    , lab AS (
        SELECT a.cl, e.label, count(*) AS n
        FROM a{_KM_ITERS} a JOIN embeddings e USING (vec_id)
        GROUP BY 1, 2
    ), best AS (
        SELECT cl, label AS majority_label, n AS n_majority FROM lab
        QUALIFY row_number() OVER (PARTITION BY cl ORDER BY n DESC, label) = 1
    ), size_ AS (
        SELECT cl, CAST(sum(n) AS BIGINT) AS n_members FROM lab GROUP BY cl
    )
    SELECT s.cl AS cluster, s.n_members, b.majority_label,
           round(b.n_majority / CAST(s.n_members AS DOUBLE), 4) AS purity
    FROM size_ s JOIN best b USING (cl)
    ORDER BY cluster
    """
    ),
)
def sim_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality certification for the trained quantizer: per
    kmeans cluster, its size, majority ground-truth label, and purity
    (majority share) — the label-agreement eval that tells an IVF
    owner whether the coarse quantizer respects the corpus's semantic
    partitions (the external-validity sibling of
    `sim_ann_kmeans_train`'s internal inertia and `sim_ivf_recall`'s
    retrieval recall; together: train → certify-internal →
    certify-external).

    Reuses the exact shared Lloyd assignment (6dp-rounded centroids
    and distances — bit-identical across engines, see the train op);
    the eval itself is one label join + two constant-size aggregates
    (≤ k×|labels| rows). Ties on majority label break to the smaller
    label id on both engines.
    """
    e = catalog.load(spark, sf_dir, "embeddings")
    assign = _kmeans_assignment(spark, sf_dir)
    lab = (
        assign.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("cl", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = (
        lab.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("cl").orderBy(F.col("n").desc(), "label")
            ),
        )
        .where(F.col("_rn") == 1)
        .select("cl", F.col("label").alias("majority_label"), F.col("n").alias("n_majority"))
    )
    size = lab.groupBy("cl").agg(F.sum("n").cast("bigint").alias("n_members"))
    return (
        size.join(best, "cl")
        .select(
            F.col("cl").alias("cluster"),
            "n_members",
            "majority_label",
            F.round(F.col("n_majority") / F.col("n_members").cast("double"), 4).alias(
                "purity"
            ),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# Composed pretraining-data filter — the end-to-end pipeline shape:
# quality gate → exact dedup → per-source token budget


_QUALITY_MIN = 0.5
_PIPE_STOPWORDS = ("a", "the")


@register(
    "pipeline_pretrain_filter",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, source, text, md5(text) AS th,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_uniq,
               len(list_filter(string_split(text, ' '),
                               x -> x IN {_PIPE_STOPWORDS!r})) AS n_stop
        FROM documents
    ), q AS (
        SELECT *,
               0.5 * (CAST(n_uniq AS DOUBLE) / n_tokens)
             + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
             + 0.2 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0) AS quality
        FROM m
    ), kept AS (
        SELECT * FROM q WHERE quality >= {_QUALITY_MIN}
        QUALIFY row_number() OVER (PARTITION BY th ORDER BY doc_id) = 1
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS token_budget,
           round(avg(quality), 4) AS avg_quality
    FROM kept GROUP BY source
    """,
)
def pipeline_pretrain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline a pretraining-data user actually runs:
    per-doc quality scoring (vocabulary diversity + stopword ratio +
    capped length prior, same formula as `text_quality_score`), a
    quality gate, exact dedup on md5(text) keeping the lowest doc_id,
    then the per-source token budget. One map-side pass computes the
    scores, one 16-byte-key shuffle dedups, one agg summarizes —
    nothing in the chain widens the shuffled rows beyond (hash, ids,
    counters)."""
    docs = catalog.load(spark, sf_dir, "documents")
    stop_pred = " OR ".join(f"x = '{s}'" for s in _PIPE_STOPWORDS)
    # tokenize ONCE into a staged column; three size() consumers off it
    m = docs.select(
        "doc_id", "source", "text", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        "source",
        F.md5(F.col("text").cast("binary")).alias("th"),
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.expr(f"size(filter(toks, x -> {stop_pred}))").alias("n_stop"),
    )
    quality = (
        0.5 * (F.col("n_uniq").cast("double") / F.col("n_tokens"))
        + 0.3 * (1.0 - F.col("n_stop").cast("double") / F.col("n_tokens"))
        + 0.2 * (F.least(F.col("n_tokens"), F.lit(100)).cast("double") / 100.0)
    )
    w = Window.partitionBy("th").orderBy("doc_id")
    kept = (
        m.withColumn("quality", quality)
        .where(F.col("quality") >= _QUALITY_MIN)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("token_budget"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# VersionedCollapsingMergeTree FINAL — the fourth ClickHouse engine of the
# pg2ch family (SURVEY §2.2): updates emit a (-1, old_version) cancel row
# plus a (+1, new_version) state row; merges collapse (key, version) pairs
# with opposite signs; FINAL is the max surviving +1 version per key.

_VC_SIGNED_CTE = """
WITH cdc AS (
    SELECT user_id AS key, event_id AS ver,
           CASE event_type WHEN 'signup' THEN 'I'
                           WHEN 'error'  THEN 'D'
                           ELSE 'U' END AS op
    FROM events
),
lagged AS (
    SELECT key, ver, op,
           lag(ver) OVER (PARTITION BY key ORDER BY ver) AS prev_ver
    FROM cdc
),
signed AS (
    SELECT key, ver AS sver, 1 AS sign FROM lagged WHERE op IN ('I', 'U')
    UNION ALL
    SELECT key, prev_ver AS sver, -1 AS sign
    FROM lagged WHERE op IN ('U', 'D') AND prev_ver IS NOT NULL
),
net AS (
    SELECT key, sver, CAST(sum(sign) AS BIGINT) AS net
    FROM signed GROUP BY key, sver
)
"""


@register(
    "cdc_versioned_collapsing",
    oracle=_VC_SIGNED_CTE
    + """
    SELECT key,
           max(CASE WHEN net = 1 THEN sver END) AS final_ver,
           CAST(count(*) FILTER (WHERE net = 1) AS BIGINT) AS n_open,
           CAST(count(*) FILTER (WHERE net <> 1) AS BIGINT) AS n_cancelled
    FROM net GROUP BY key
    HAVING count(*) FILTER (WHERE net = 1) > 0
    """,
)
def cdc_versioned_collapsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL over the derived CDC log:
    every update cancels its predecessor version explicitly (−1 row) and
    asserts its own (+1 row); deletes emit only the cancel. A version
    survives iff its net sign is +1, and FINAL is the max surviving
    version per key — a deleted key has no surviving version and drops
    out without any last-op special-casing (contrast
    `cdc_collapsing_final`, which filters on the latest op).

    Scale: ONE shuffle total. The lag window partitions by key; the
    signed expansion is an in-row explode (NOT a union of two filtered
    branches — a union would discard the window's partitioning and
    force the net agg to re-shuffle); both the (key, version) net agg
    and the per-key final agg then reuse the key partitioning
    (HashPartitioning(key) satisfies both clusterings), which is the
    same single-pass shape ClickHouse gets from its merge-time
    collapse — verified by plan test (tests/test_plans.py)."""
    from pg2ch_spark.cdc.derive import derive_cdc

    log = derive_cdc(spark, sf_dir).select("key", "ver", "op")
    w = Window.partitionBy("key").orderBy("ver")
    lagged = log.withColumn("prev_ver", F.lag("ver").over(w))
    signed = lagged.select(
        "key",
        F.explode(
            F.expr(
                """
                CASE op
                  WHEN 'I' THEN array(named_struct('sver', ver, 'sign', 1))
                  WHEN 'U' THEN CASE
                      WHEN prev_ver IS NULL
                        THEN array(named_struct('sver', ver, 'sign', 1))
                      ELSE array(named_struct('sver', ver, 'sign', 1),
                                 named_struct('sver', prev_ver, 'sign', -1))
                    END
                  ELSE CASE
                      WHEN prev_ver IS NULL
                        THEN CAST(array() AS array<struct<sver: bigint, sign: int>>)
                      ELSE array(named_struct('sver', prev_ver, 'sign', -1))
                    END
                END
                """
            )
        ).alias("sr"),
    ).select("key", "sr.sver", "sr.sign")
    net = signed.groupBy("key", "sver").agg(F.sum("sign").cast("bigint").alias("net"))
    open_ = F.col("net") == 1
    return (
        net.groupBy("key")
        .agg(
            F.max(F.when(open_, F.col("sver"))).alias("final_ver"),
            F.count(F.when(open_, 1)).alias("n_open"),
            F.count(F.when(~open_, 1)).alias("n_cancelled"),
        )
        .where(F.col("n_open") > 0)
    )


# ---------------------------------------------------------------------------
# SummingMergeTree FINAL — ClickHouse's pre-aggregating engine: rows with
# the same key are replaced at merge time by one row holding the sums of
# the numeric columns. pg2ch targets counter-style tables at this engine.


@register(
    "cdc_summing_final",
    oracle="""
    WITH cdc AS (
        SELECT user_id AS key, event_id AS ver,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error'  THEN 'D'
                               ELSE 'U' END AS op,
               value
        FROM events
    )
    SELECT key,
           count(*) AS n_parts,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS val_sum,
           max(ver) AS last_ver
    FROM cdc WHERE op IN ('I', 'U')
    GROUP BY key
    """,
)
def cdc_summing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree FINAL: each insert row is a delta; the merged
    state per key is the sum of the numeric payload (`value`) over all
    inserted rows, with the row count standing in for the un-merged part
    count. Map-side partial sums do exactly what ClickHouse's background
    merges do, so the shuffle carries one partial row per (partition,
    key)."""
    from pg2ch_spark.cdc.derive import derive_cdc

    log = derive_cdc(spark, sf_dir)
    return (
        log.where(F.col("op").isin("I", "U"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            # decimal-mediated sum: a double sum's partial-order rounding
            # can land an ulp either side of a half-cent boundary and
            # diverge from the oracle there (caught by the randomized
            # edge corpus, round 4) — summing exact decimals removes the
            # order sensitivity; the final 2dp value casts back to
            # double exactly.
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("val_sum"),
            F.max("ver").alias("last_ver"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot — wide conditional aggregation with an explicit value list


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS f_total,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS o_total,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS p_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT orders to one row per priority × {F,O,P} status columns.
    The pivot values are DECLARED, not scan-inferred: an unlisted-values
    pivot runs a distinct-collect job over the pivot column first, which
    at 100 TB is a full extra pass (and nondeterministic column order).
    With the list pinned, pivot compiles to a two-phase aggregate
    (pre-aggregate by (priority, status), then PivotFirst by priority —
    plan-tested): two narrow shuffles, no extra job, and the first
    shuffle carries one partial row per (partition, priority, status)
    rather than raw rows."""
    o = catalog.load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    # Spark's pivot yields NULL counts for absent (priority, status)
    # cells; SQL's count(*) FILTER yields 0 — normalize to the SQL side.
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("f_n"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("o_n"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("p_n"),
        F.col("F_total").alias("f_total"),
        F.col("O_total").alias("o_total"),
        F.col("P_total").alias("p_total"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split — the hash split every training-data
# pipeline needs: stable under reruns, independent of row order, and
# computable identically by any engine that has md5.


@register(
    "split_train_holdout",
    oracle="""
    WITH tagged AS (
        SELECT doc_id, source, n_chars,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
        FROM documents
    )
    SELECT CASE WHEN h BETWEEN '0' AND '9' OR h IN ('a', 'b') THEN 'train'
                WHEN h IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           count(DISTINCT source) AS n_sources,
           min(doc_id) AS doc_id_min,
           max(doc_id) AS doc_id_max
    FROM tagged GROUP BY 1
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split by the first hex
    nibble of md5(doc_id): '0'-'b' → train, 'c'-'d' → val, 'e'-'f' →
    test. Hash-splitting (vs random sampling) is reproducible across
    engines and runs, immune to row order, and assigns a document the
    same split even when the corpus grows — the property that keeps a
    holdout honest across pipeline re-executions. Pure map-side tag +
    one 3-key aggregate."""
    docs = catalog.load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    split = (
        F.when(h.between("0", "9") | h.isin("a", "b"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "doc_id", "source", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
        )
    )


# ---------------------------------------------------------------------------
# Symmetric int8 embedding quantization — the storage/bandwidth lever for
# vector corpora (4x smaller than float32, 8x smaller than the double
# math): per-vector absmax scale, round-half-up to [-127, 127].


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, vd, list_max(list_transform(vd, x -> abs(x))) AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, scale,
               list_transform(vd, x -> CAST(floor(x / scale * 127 + 0.5) AS BIGINT)) AS qv
        FROM s WHERE scale > 0
    )
    SELECT vec_id,
           round(scale, 6) AS scale_r,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max,
           CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INT) AS n_sat
    FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: q_i = floor(x_i / absmax * 127 + 0.5)
    (explicit half-up — both engines floor identically; `round()` would
    hit banker's-rounding divergence). All-zero vectors are excluded (no
    scale). Output is integer summaries + the 6dp scale, so the check is
    exact: every double op (cast, divide, multiply, add) is the same
    IEEE operation in the same order in both engines.

    Scale: in-row HOFs, zero shuffle — this is the map stage that would
    precede writing an int8 column + per-vector scale to parquet,
    cutting vector-corpus bytes 4x before any similarity work."""
    e = catalog.load(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("vd"),
        )
        .withColumn("scale", F.expr("array_max(transform(vd, x -> abs(x)))"))
        .where(F.col("scale") > 0)
        .withColumn(
            "qv",
            F.expr("transform(vd, x -> CAST(floor(x / scale * 127 + 0.5) AS BIGINT))"),
        )
        .select(
            "vec_id",
            F.round("scale", 6).alias("scale_r"),
            F.expr("aggregate(qv, CAST(0 AS BIGINT), (a, b) -> a + b)").alias("q_sum"),
            F.expr("CAST(array_min(qv) AS INT)").alias("q_min"),
            F.expr("CAST(array_max(qv) AS INT)").alias("q_max"),
            F.expr("CAST(size(filter(qv, x -> abs(x) = 127)) AS INT)").alias("n_sat"),
        )
    )


# ---------------------------------------------------------------------------
# Map-typed scalar functions — the map slice of group H's charter
# (string/date/math/array/MAP/json): build, inspect, and look up a map
# column; emitted as scalars per D5.


@register(
    "fn_map_ops",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_orderstatus) AS n_statuses,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS open_cnt,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over a status→count map per priority:
    `map_from_entries` builds it from sorted (status, n) structs,
    `size`/`element_at`/`map_keys` read it back. The emitted columns are
    scalars (D5), so the oracle can state the same facts with plain
    conditional aggregation — the Spark plan is the part under test
    (two-level agg keeps the map build AFTER the per-status counts, so
    maps never transit the wide shuffle)."""
    o = catalog.load(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per_status.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("m")
    )
    return m.select(
        "o_orderpriority",
        F.size("m").cast("bigint").alias("n_statuses"),
        F.coalesce(F.element_at("m", "O"), F.lit(0)).alias("open_cnt"),
        F.array_join(F.map_keys("m"), ",").alias("statuses"),
    )


# ---------------------------------------------------------------------------
# ClickHouse windowFunnel / retention — the event-analytics aggregate
# functions a ClickHouse-backed product would run on the tables pg2ch
# replicates; re-expressed as one-shuffle Spark plans.

_FUNNEL_WINDOW_S = 3600


@register(
    "events_window_funnel",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events
    ),
    s AS (
        SELECT user_id, min(t) AS t1 FROM e
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id, min(e.t) AS t2
        FROM e JOIN s USING (user_id)
        WHERE e.event_type = 'view' AND e.t > s.t1
          AND e.t <= s.t1 + {_FUNNEL_WINDOW_S}
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.t) AS t3
        FROM e JOIN v USING (user_id) JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.t > v.t2
          AND e.t <= s.t1 + {_FUNNEL_WINDOW_S}
        GROUP BY e.user_id
    ),
    lv AS (
        SELECT u.user_id,
               CASE WHEN p.user_id IS NOT NULL THEN 3
                    WHEN v.user_id IS NOT NULL THEN 2
                    WHEN s.user_id IS NOT NULL THEN 1
                    ELSE 0 END AS level
        FROM (SELECT DISTINCT user_id FROM e) u
        LEFT JOIN s ON u.user_id = s.user_id
        LEFT JOIN v ON u.user_id = v.user_id
        LEFT JOIN p ON u.user_id = p.user_id
    )
    SELECT level, count(*) AS n_users FROM lv GROUP BY level
    """,
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `windowFunnel(3600)(ts, signup, view, purchase)`:
    per user, the deepest chain level reached by the greedy
    earliest-first scan — first signup anchors the window, then the
    first view strictly after it, then the first purchase strictly
    after that, all within 1h of the anchor. Output: users per level.

    The oracle states the same greedy semantics as three min-filter
    CTE hops (level N's earliest event bounds level N+1's search — the
    chained-min form is provably the greedy scan's result). The Spark
    plan instead does what windowFunnel does inside ClickHouse: ONE
    shuffle collects each user's (t, type) events, `array_sort` orders
    them in-row, and a HOF `aggregate` fold walks the sorted array
    carrying (level, anchor_t, prev_t) — no join chain, no per-level
    shuffle, and the state is three scalars however long the funnel
    gets. Event times floor to seconds (D3); ties at the same second
    cannot advance two levels (strict > on an integer), so scan order
    within a tie group is immaterial."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("et"),
        F.col("ts").cast("long").alias("t"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "et"))).alias("evs")
    )
    level = F.expr(
        f"""
        aggregate(
          evs,
          named_struct('lvl', 0, 't1', CAST(0 AS BIGINT), 'tp', CAST(0 AS BIGINT)),
          (st, e) -> CASE
             WHEN st.lvl = 0 AND e.et = 'signup'
               THEN named_struct('lvl', 1, 't1', e.t, 'tp', e.t)
             WHEN st.lvl = 1 AND e.et = 'view'
                  AND e.t > st.tp AND e.t <= st.t1 + {_FUNNEL_WINDOW_S}
               THEN named_struct('lvl', 2, 't1', st.t1, 'tp', e.t)
             WHEN st.lvl = 2 AND e.et = 'purchase'
                  AND e.t > st.tp AND e.t <= st.t1 + {_FUNNEL_WINDOW_S}
               THEN named_struct('lvl', 3, 't1', st.t1, 'tp', e.t)
             ELSE st
          END,
          st -> st.lvl)
        """
    )
    return (
        per_user.select(level.alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_retention",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c1,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2,
               max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c3
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(c1) AS BIGINT) AS n_base,
           CAST(sum(c1 * c2) AS BIGINT) AS n_ret_purchase,
           CAST(sum(c1 * c3) AS BIGINT) AS n_ret_error,
           round(CAST(sum(c1 * c2) AS DOUBLE) / sum(c1), 4) AS purchase_rate,
           round(CAST(sum(c1 * c3) AS DOUBLE) / sum(c1), 4) AS error_rate
    FROM per_user
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `retention(signup, purchase, error)`: per user an
    array r where r[i] = cond_i AND cond_1, summed across users —
    i.e. of the users who hit the base condition, how many also hit
    each follow-up. Two-level aggregate: per-user condition bits
    (map-side partials — the shuffle carries 3 bits per user per
    partition), then one global sum."""
    ev = catalog.load(spark, sf_dir, "events")
    bit = lambda et: F.max(F.when(F.col("event_type") == et, 1).otherwise(0))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        bit("signup").alias("c1"), bit("purchase").alias("c2"), bit("error").alias("c3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c1").cast("bigint").alias("n_base"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("n_ret_purchase"),
        F.sum(F.col("c1") * F.col("c3")).cast("bigint").alias("n_ret_error"),
        F.round(
            F.sum(F.col("c1") * F.col("c2")).cast("double") / F.sum("c1"), 4
        ).alias("purchase_rate"),
        F.round(
            F.sum(F.col("c1") * F.col("c3")).cast("double") / F.sum("c1"), 4
        ).alias("error_rate"),
    )


# ---------------------------------------------------------------------------
# Format roundtrips — group A's non-parquet surface. pg2ch's entire sink
# path is TabSeparated encoding into ClickHouse (R11/R12:
# sources/clickhouse.py holds the per-value encoder); these exercise the
# DISTRIBUTED form: every executor writes its partition in the text
# format, the read-back re-parses with a declared schema, and the oracle
# proves the roundtrip lossless by aggregating the ORIGINAL table.


@register(
    "sink_tsv_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(sum(c_acctbal), 2) AS bal_total,
           count(DISTINCT c_nationkey) AS n_nations,
           max(c_name) AS max_name
    FROM customer GROUP BY c_mktsegment
    """,
)
def sink_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TabSeparated sink + re-source: write customer as TSV
    (tab delimiter, ``\\N`` nulls — the ClickHouse TSV dialect
    sources/clickhouse.py encodes per-value), read it back with the
    DECLARED schema (never inferSchema — a 100 TB text scan to guess
    types is a full extra pass), aggregate the re-parsed rows. The
    oracle aggregates the original parquet, so any encode/parse loss
    (null vs empty, numeric formatting, delimiter collision) breaks the
    hash match. Each executor writes its own part file — the sink is
    embarrassingly parallel, exactly like pg2ch's per-batch TSV POST."""
    import shutil
    import uuid

    from pg2ch_spark.streaming.runner import scratch_dir

    cust = catalog.load(spark, sf_dir, "customer")
    base = scratch_dir("pg2ch_tsv_")
    out = base + "/" + uuid.uuid4().hex[:8]
    (
        cust.write.mode("overwrite")
        .options(sep="\t", nullValue="\\N", header=False)
        .csv(out)
    )
    back = (
        spark.read.schema(cust.schema)
        .options(sep="\t", nullValue="\\N", header=False)
        .csv(out)
    )
    res = (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("bal_total"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.max("c_name").alias("max_name"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return res


@register(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source: write documents as JSONL, read back with the
    declared schema, aggregate per lang. JSON string escaping is
    well-defined for arbitrary document text (tabs, quotes, unicode),
    so the roundtrip is lossless where naive TSV would not be — which
    is why JSONL is the interchange default for text corpora. Schema
    declared on read (inferSchema on JSON is a full scan at 100 TB);
    per-partition part files in and out."""
    import shutil
    import uuid

    from pg2ch_spark.streaming.runner import scratch_dir

    docs = catalog.load(spark, sf_dir, "documents")
    base = scratch_dir("pg2ch_jsonl_")
    out = base + "/" + uuid.uuid4().hex[:8]
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(docs.schema).json(out)
    res = (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
            F.countDistinct("source").alias("n_sources"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return res


# ---------------------------------------------------------------------------
# Physical-layout operators — partition pruning and bucketed co-located
# joins, the two storage-layout levers that matter most at 100 TB. Both
# relocate fixture data into the layout under test, then prove the plan
# (plan tests) and the values (oracles over the ORIGINAL tables).


@register(
    "scan_partitioned_pruning",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
)
def scan_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning: orders is rewritten partitioned by
    o_orderpriority (5 directories), and the query filters one
    priority. The filter must become a PARTITION filter — directory
    elimination at planning time, zero I/O for the other four
    partitions — not a data filter evaluated per row (plan-tested).
    At 100 TB, partition-on-ingest-date + prune is the difference
    between scanning a day and scanning a decade; the oracle aggregates
    the original table, proving relocation loses nothing."""
    import shutil

    from pg2ch_spark.streaming.runner import scratch_dir

    orders = catalog.load(spark, sf_dir, "orders")
    base = scratch_dir("pg2ch_part_")
    out = base + "/orders_parted"
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    res = (
        _partition_pruned_scan(spark, out)
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return res


def _partition_pruned_scan(spark: SparkSession, parted_path: str) -> DataFrame:
    """The pruned read, separated so the plan test can assert on it
    before materialization."""
    back = spark.read.parquet(parted_path)
    return (
        back.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: orders and customer are written
    bucketed 8 ways on the join key (bucketBy + sortBy), so the
    sort-merge join consumes both sides' bucket files directly — ZERO
    Exchange in the join stage (plan-tested). This is the layout lever
    for the repeated big-big join neither side of which broadcasts at
    100 TB: pay the shuffle once at write time, never again per query.
    Broadcast is disabled for the probe (at fixture scale customer
    would broadcast and hide the property being demonstrated); the
    oracle joins the original tables, proving the bucketed relocation
    loses nothing."""
    import shutil
    import uuid

    from pg2ch_spark.streaming.runner import scratch_dir

    db = f"pg2ch_bucket_db_{uuid.uuid4().hex[:8]}"
    loc = scratch_dir("pg2ch_bucketdb_")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    orders = catalog.load(spark, sf_dir, "orders")
    cust = catalog.load(spark, sf_dir, "customer")
    (
        orders.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(f"{db}.orders_b")
    )
    (
        cust.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(f"{db}.customer_b")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        res = _bucketed_join(spark, db).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(loc, ignore_errors=True)
    return res


def _bucketed_join(spark: SparkSession, db: str) -> DataFrame:
    """The co-located join, separated so the plan test can assert
    zero Exchange before materialization."""
    o = spark.table(f"{db}.orders_b")
    c = spark.table(f"{db}.customer_b")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# URL scalar functions — the remaining group-H family (ClickHouse ships
# a large URL function set; Spark's parse_url covers the same parts).


@register(
    "fn_url_parse",
    oracle="""
    SELECT doc_id,
           source || '.example.org' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS qlang
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL functions: construct a canonical URL from document fields,
    then recover host/path/query-parameter with `parse_url`. The oracle
    states the expected parts directly from the construction, so the
    check proves Spark's parser inverts the builder exactly (a
    construct→parse round-trip, same pattern as the format roundtrips).
    Map-side only."""
    docs = catalog.load(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("qlang"),
    )


# ---------------------------------------------------------------------------
# Pretraining-data preparation: context-window chunking and reproducible
# stratified sampling.

_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               len(string_split(text, ' ')) AS n
        FROM documents WHERE doc_id % 5 = 1
    ),
    chunks AS (
        SELECT doc_id, CAST(k AS INT) AS chunk_idx,
               list_slice(tk, k * {_CHUNK_STRIDE} + 1,
                          k * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}) AS ck
        FROM toks, unnest(range(0, (CASE WHEN n <= {_CHUNK_TOKENS} THEN 0
                   ELSE (n - {_CHUNK_TOKENS} + {_CHUNK_STRIDE} - 1) // {_CHUNK_STRIDE}
                   END) + 1)) AS t(k)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(ck) AS INT) AS n_tokens,
           md5(array_to_string(ck, ' ')) AS chunk_hash
    FROM chunks
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into
    {tokens}-token chunks with a {stride}-token stride (overlap keeps
    boundary context — the standard pretraining prep step before
    packing). Chunk count = 1 + ceil((n - size) / stride) for n > size,
    else 1, so every token lands in ≥1 chunk and the tail is kept
    unpadded. In-row: slice the token array per chunk index and hash
    it — one explode, no shuffle before the explode, and the emitted
    rows carry a 16-byte hash + counters, never the chunk text."""
    docs = catalog.load(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 1)
    toks = docs.select("doc_id", F.split("text", " ").alias("tk")).withColumn(
        "n", F.size("tk")
    )
    n_extra = F.expr(
        f"CASE WHEN n <= {_CHUNK_TOKENS} THEN 0"
        f" ELSE CAST(ceil((n - {_CHUNK_TOKENS}) / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS INT) END"
    )
    chunks = toks.withColumn("n_chunks", n_extra + 1).select(
        "doc_id",
        "tk",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_idx"),
    )
    ck = F.expr(f"slice(tk, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_TOKENS})")
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(ck).cast("int").alias("n_tokens"),
        F.md5(F.array_join(ck, " ").cast("binary")).alias("chunk_hash"),
    )


_STRAT_N = 20  # sample size per stratum


@register(
    "sample_stratified_hash",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT lang,
           count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS chars_sampled,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM ranked WHERE rk <= {_STRAT_N}
    GROUP BY lang
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling: exactly {n} documents per
    language, chosen by md5(doc_id) order — a deterministic shuffle
    that any engine reproduces bit-identically, unlike
    `sample()`/`TABLESAMPLE` whose RNG is engine-private. Rank within
    stratum + filter is one shuffle on the stratum key; the hash order
    also makes the sample stable under corpus growth (a new document
    displaces at most one row per stratum). This is the eval-set /
    ablation-slice primitive for a corpus pipeline."""
    docs = catalog.load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _STRAT_N)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars_sampled"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )
