"""Group K (pipeline ops, round 4) — training-data preparation operators.

Six operators a large-scale pretraining/post-training data pipeline
runs between "raw corpus" and "batched tokens": BPE merge-candidate
mining, weighted source mixing, preference-pair construction,
curriculum length bucketing, incremental snapshot dedup, and
embedding standardization. All are pure DataFrame plans — the hot
paths are JVM-side HOFs and hash functions, never Python.

Scale notes (100 TB of documents):
- bpe merge candidates: the bigram explode multiplies rows ~100×, but
  map-side partial aggregation collapses each partition's Zipf head
  before the shuffle; the global top-k is TakeOrderedAndProject (no
  total sort).
- weighted mixing: a map-only hash filter — zero shuffle; the kept set
  is a pure function of (doc_id, source), so re-runs and backfills
  select the identical sample on any engine.
- preference pairs: one shuffle on the (source, lang) group key; the
  two rank orders share the same Exchange (plan-tested).
- length buckets: global rank computed the distributed two-pass way
  (range-shard on the order key, local rank + broadcast shard
  offsets) — the corpus is never windowed in a single task, unlike the
  naive global ntile (see `pipeline_pack_sequences` for the sibling
  cumsum form).
- incremental dedup: anti-join on md5(text) — 16-byte keys shuffle,
  never the text; the base side of a daily increment is the big side,
  so the join is shuffle-hash on the hash key (no sort needed).
- embedding standardize: per-dimension moments are 64 tiny rows
  broadcast back — the corpus shuffles once (posexplode partial agg)
  and the normalization itself is a zero-shuffle in-row HOF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

# ---------------------------------------------------------------------------
# BPE merge-candidate mining — the first iteration of BPE tokenizer
# training: corpus-wide adjacent-token-pair counts, top-k.

_BPE_TOPK = 30


@register(
    "text_bpe_merge_candidates",
    oracle=f"""
    WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents
    ), pairs AS (
        SELECT toks[i] || ' ' || toks[i + 1] AS pair
        FROM t, unnest(range(1, len(toks))) AS r(i)
        WHERE len(toks) >= 2
    ), counted AS (
        SELECT pair, count(*) AS n FROM pairs GROUP BY pair
    )
    SELECT pair, n FROM counted
    QUALIFY row_number() OVER (ORDER BY n DESC, pair) <= {_BPE_TOPK}
    """,
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} adjacent token pairs corpus-wide — the merge-candidate
    scan of one BPE training iteration (tokenizer induction over the
    corpus the engine will later tokenize).

    Bigrams are formed in-row with `zip_with` over two shifted slices
    (codegen, no Python), exploded, and partially aggregated map-side —
    the Zipf head collapses before the shuffle, so the exchange carries
    ~|vocab²∩corpus| rows, not ~|tokens|. The top-k is `orderBy.limit`
    = TakeOrderedAndProject: each task keeps k rows, the driver merges
    heaps; no global sort at any scale. Ties break on the pair text so
    the result is total-ordered and engine-independent.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    return counted.orderBy(F.col("n").desc(), "pair").limit(_BPE_TOPK)


# ---------------------------------------------------------------------------
# Weighted source mixing — deterministic hash-threshold sampling to a
# per-source rate table (the dataset-mixing step of pretraining prep).

# Per-source keep rates by source band: src0-4 full weight, src5-9
# half, src10-14 quarter, src15-19 eighth. Rates are dyadic so the
# hex thresholds below are exact (rate × 16^8 is an integer).
_MIX_THRESHOLDS = {0: None, 1: "80000000", 2: "40000000", 3: "20000000"}


@register(
    "pipeline_mix_weighted",
    oracle="""
    WITH banded AS (
        SELECT doc_id, source, n_chars,
               CAST(substr(source, 4) AS INT) // 5 AS band,
               substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8) AS h
        FROM documents
    ), kept AS (
        SELECT * FROM banded
        WHERE CASE band WHEN 0 THEN TRUE
                        WHEN 1 THEN h < '80000000'
                        WHEN 2 THEN h < '40000000'
                        ELSE h < '20000000' END
    )
    SELECT source, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM kept GROUP BY source
    """,
)
def pipeline_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: each source band keeps a dyadic fraction
    (1, 1/2, 1/4, 1/8) of its documents, selected by comparing the
    first 8 hex digits of md5(doc_id:source) against the rate's exact
    hex threshold — a Bernoulli sample that is a pure function of the
    row, so any engine (and any re-run over a grown corpus) keeps the
    identical set. This is how mixture weights ("3 parts web, 1 part
    code") are applied without an RNG whose state would have to be
    coordinated across 1000 executors.

    Map-only: the filter is evaluated at the scan (no shuffle until the
    final per-source count), and the md5 comparison is codegen'd.
    Fixed-width lowercase hex compares correctly as a string, so no
    bigint conversion is needed on either engine.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), "source").cast("binary")
        ),
        1,
        8,
    )
    band = (F.expr("substring(source, 4)").cast("int") / 5).cast("int")
    keep = F.when(band == 0, F.lit(True))
    for b, thr in _MIX_THRESHOLDS.items():
        if thr is not None:
            keep = keep.when(band == b, h < F.lit(thr))
    return (
        docs.where(keep.otherwise(F.lit(False)))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Preference-pair construction — the DPO/RLHF data-prep join: per
# group, pair the best candidate against the worst.


@register(
    "pipeline_pref_pairs",
    oracle="""
    WITH ranked AS (
        SELECT source, lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY source, lang
                                  ORDER BY n_chars DESC, doc_id) AS rk_best,
               row_number() OVER (PARTITION BY source, lang
                                  ORDER BY n_chars ASC, doc_id DESC) AS rk_worst,
               count(*) OVER (PARTITION BY source, lang) AS grp_n
        FROM documents
    ), best AS (
        SELECT source, lang, doc_id AS chosen_id, n_chars AS chosen_chars
        FROM ranked WHERE rk_best = 1 AND grp_n >= 2
    ), worst AS (
        SELECT source, lang, doc_id AS rejected_id, n_chars AS rejected_chars
        FROM ranked WHERE rk_worst = 1 AND grp_n >= 2
    )
    SELECT b.source, b.lang, chosen_id, rejected_id,
           chosen_chars - rejected_chars AS margin_chars
    FROM best b JOIN worst w
      -- NULL-safe on lang: GROUP BY (Spark and ClickHouse alike) keeps
      -- a NULL-lang group, so the re-join of the two extreme tables
      -- must not drop it through NULL != NULL equi-join semantics
      ON b.source = w.source AND b.lang IS NOT DISTINCT FROM w.lang
    """,
)
def pipeline_pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference pairs per (source, lang): the highest-ranked document
    (n_chars DESC, doc_id — a stand-in for a reward score) paired with
    the lowest-ranked (n_chars ASC, doc_id DESC), with the score
    margin — the "chosen vs rejected" construction step of DPO/RLHF
    data prep. Groups of one are dropped (no pair exists); the
    opposite tie-break directions guarantee chosen ≠ rejected for
    every group of ≥2 even when all scores tie.

    The oracle ranks with two windows; here both extremes come out of
    ONE aggregation — max/min over struct(n_chars, −doc_id), whose
    lexicographic order encodes exactly those two tie-breaks — so the
    corpus is scanned once and shuffled once, with map-side partials
    (each partition contributes one candidate pair per group, not its
    rows). No window, no self-join (plan-tested).
    """
    docs = catalog.load(spark, sf_dir, "documents")
    ranked = F.struct(
        F.col("n_chars").alias("nc"), (-F.col("doc_id")).alias("negid")
    )
    agg = (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            F.max(ranked).alias("mx"),
            F.min(ranked).alias("mn"),
        )
        .where(F.col("grp_n") >= 2)
    )
    return agg.select(
        "source",
        "lang",
        (-F.col("mx.negid")).alias("chosen_id"),
        (-F.col("mn.negid")).alias("rejected_id"),
        (F.col("mx.nc") - F.col("mn.nc")).alias("margin_chars"),
    )


# ---------------------------------------------------------------------------
# Curriculum length bucketing — ntile(4) over token count, computed as
# a DISTRIBUTED global rank (range-shard + broadcast offsets), never a
# single-task window.

_CURR_K = 4  # buckets
_CURR_SHARD = 16  # n_tokens per range shard


@register(
    "pipeline_length_buckets",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), b AS (
        SELECT doc_id, n_tokens,
               ntile({_CURR_K}) OVER (ORDER BY n_tokens, doc_id) AS bucket
        FROM t
    )
    SELECT bucket, count(*) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM b GROUP BY bucket
    """,
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum length buckets: documents split into {k} equal-depth
    buckets by (token count, doc_id) order — the length-bucketed
    batching / curriculum-stage assignment step (short docs first,
    long-context docs last).

    The oracle's `ntile(4) OVER (ORDER BY ...)` is a single-task global
    sort — the one window shape this repo bans at scale. Here the
    global rank is computed the distributed two-pass way (sibling of
    `pipeline_pack_sequences`' prefix sum):

    1. range-shard on the LEADING order key (shard = n_tokens div
       {shard}) — range sharding means (shard, n_tokens, doc_id) order
       IS global (n_tokens, doc_id) order;
    2. row_number within each shard (bounded parallel windows) + each
       shard's row count prefix-summed into broadcast offsets → exact
       global rank;
    3. ntile's bucket boundary formula applied to the rank in closed
       form: with n rows, the first n mod k buckets get ⌈n/k⌉ rows —
       and n itself is the full-frame sum in the SAME offsets window
       pass, so the broadcast side carries (shard, offset, n_total)
       and no second corpus scan or cross join exists.
    """
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sharded = docs.withColumn(
        "shard", (F.col("n_tokens") / _CURR_SHARD).cast("long")
    )
    w_local = Window.partitionBy("shard").orderBy("n_tokens", "doc_id")
    local = sharded.withColumn("local_rk", F.row_number().over(w_local))
    w_shard = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # |shards| rows (≤ max_tokens/16) — the only globally-windowed
    # frame; both window frames share its one tiny sort.
    offsets = (
        sharded.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("srows"))
        .withColumn("offset", F.sum("srows").over(w_shard) - F.col("srows"))
        .withColumn("n_total", F.sum("srows").over(w_all))
        .select("shard", "offset", "n_total")
    )
    ranked = local.join(F.broadcast(offsets), "shard").withColumn(
        "rk", F.col("offset") + F.col("local_rk")
    )
    base = (F.col("n_total") / _CURR_K).cast("long")
    rem = F.col("n_total") % _CURR_K
    big = rem * (base + 1)  # rows covered by the ⌈n/k⌉-sized buckets
    bucket = F.when(
        F.col("rk") <= big, F.ceil(F.col("rk") / (base + 1))
    ).otherwise(rem + F.ceil((F.col("rk") - big) / base))
    return (
        ranked.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental snapshot dedup — the daily-ingest primitive: dedup a new
# batch against the already-ingested corpus, then within itself.


@register(
    "dedup_incremental_snapshot",
    oracle="""
    WITH base AS (
        SELECT DISTINCT md5(text) AS th FROM documents WHERE source = 'src0'
    ), incoming AS (
        SELECT doc_id, source, md5(text) AS th FROM documents
        WHERE source <> 'src0'
    ), vs_base AS (
        SELECT i.* FROM incoming i ANTI JOIN base b ON i.th = b.th
    ), in_batch AS (
        SELECT doc_id, source, th,
               row_number() OVER (PARTITION BY th ORDER BY doc_id) AS rk
        FROM vs_base
    )
    SELECT source,
           count(*) FILTER (rk = 1) AS n_kept,
           count(*) FILTER (rk > 1) AS n_dropped_in_batch,
           (SELECT count(*) FROM incoming) -
               (SELECT count(*) FROM vs_base) AS n_dropped_vs_base
    FROM in_batch GROUP BY source
    """,
)
def dedup_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of an incoming batch (source ≠ src0) against
    the ingested corpus snapshot (src0): drop exact duplicates of the
    base first (anti-join on md5(text)), then keep-first within the
    survivors — the ordering a daily ingest runs so a doc seen
    yesterday never re-enters and today's internal dups collapse once.
    Per-source report: kept, dropped-in-batch, dropped-vs-base (the
    latter a corpus-wide constant column, as in the oracle).

    Both steps shuffle 16-byte md5 keys, never text. At 100 TB the
    base is the big side, so the anti-join hashes the INCREMENT
    (days are small, snapshots are huge) — Spark's left-anti with the
    small left side broadcast when it fits, shuffle-hash otherwise;
    either way the snapshot is never sorted.
    """
    docs = catalog.load(spark, sf_dir, "documents").withColumn(
        "th", F.md5(F.col("text").cast("binary"))
    )
    base = docs.where(F.col("source") == "src0").select("th").distinct()
    incoming = docs.where(F.col("source") != "src0").select(
        "doc_id", "source", "th"
    )
    vs_base = incoming.join(base, "th", "left_anti")
    n_in = incoming.groupBy().agg(F.count(F.lit(1)).alias("_n_in"))
    n_vs = vs_base.groupBy().agg(F.count(F.lit(1)).alias("_n_vs"))
    dropped_vs_base = n_in.crossJoin(n_vs).select(
        (F.col("_n_in") - F.col("_n_vs")).alias("n_dropped_vs_base")
    )
    w = Window.partitionBy("th").orderBy("doc_id")
    in_batch = vs_base.withColumn("rk", F.row_number().over(w))
    return (
        in_batch.groupBy("source")
        .agg(
            F.count(F.when(F.col("rk") == 1, 1)).alias("n_kept"),
            F.count(F.when(F.col("rk") > 1, 1)).alias("n_dropped_in_batch"),
        )
        .crossJoin(F.broadcast(dropped_vs_base))
        .select("source", "n_kept", "n_dropped_in_batch", "n_dropped_vs_base")
    )


# ---------------------------------------------------------------------------
# Embedding standardization — per-dimension z-scoring (feature
# whitening, diagonal form) of the embedding corpus.

_STD_DIMS = 4  # emitted dims (stats computed over all 64)


@register(
    "embedding_standardize",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, i,
               CAST(embedding[i] AS DOUBLE) AS v
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    ), stats AS (
        SELECT i, avg(v) AS mu,
               sqrt(avg(v * v) - avg(v) * avg(v)) AS sigma
        FROM e GROUP BY i
    )
    SELECT e.vec_id, e.label, e.i AS dim,
           round((e.v - s.mu) / s.sigma, 4) AS z
    FROM e JOIN stats s ON e.i = s.i
    WHERE e.i <= {_STD_DIMS}
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (z-score whitening, diagonal
    covariance) of the embedding corpus — the normalization step before
    cosine/ANN indexing when dimensions have unequal scales. Emits the
    first {dims} dims per vector; the moment statistics cover ALL
    dimensions.

    Population moments per dimension are one posexplode + partial agg —
    the shuffle carries 64 (sum, sumsq, count) partials per map task,
    not the corpus — and the 64-row stats frame broadcasts back onto
    the exploded rows. sigma uses the E[v²]−E[v]² closed form so one
    pass suffices (same form as the oracle, so float rounding agrees).
    Values cast float→double BEFORE any arithmetic on both engines.
    """
    emb = catalog.load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    ).withColumn("dim", F.col("pos") + 1)
    stats = e.groupBy("dim").agg(
        F.avg("v").alias("mu"),
        F.sqrt(F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v")).alias(
            "sigma"
        ),
    )
    return (
        e.where(F.col("dim") <= _STD_DIMS)
        .join(F.broadcast(stats), "dim")
        .select(
            "vec_id",
            "label",
            "dim",
            # try_divide: a constant dimension has sigma 0 — ANSI mode
            # would abort the job; the oracle's /0 is NULL
            F.round(F.try_divide(F.col("v") - F.col("mu"), F.col("sigma")), 4).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Top principal component by power iteration — distributed iterative
# linear algebra over the embedding corpus (uncentered PCA / top
# singular direction).

_PCA_ITERS = 2  # fixed, deterministic — the declared contract


@register(
    "sim_pca_power_component",
    oracle="""
    WITH e AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    ), s0 AS (
        SELECT vec_id, sum(x) AS s FROM e GROUP BY vec_id
    ), v1 AS (
        SELECT e.i, sum(e.x * s0.s) AS w FROM e JOIN s0 USING (vec_id) GROUP BY e.i
    ), v1n AS (
        SELECT i, w / sqrt(sum(w * w) OVER ()) AS v FROM v1
    ), s1 AS (
        SELECT e.vec_id, sum(e.x * v1n.v) AS s
        FROM e JOIN v1n ON e.i = v1n.i GROUP BY e.vec_id
    ), v2 AS (
        SELECT e.i, sum(e.x * s1.s) AS w FROM e JOIN s1 USING (vec_id) GROUP BY e.i
    ), v2n AS (
        SELECT i, w / sqrt(sum(w * w) OVER ()) AS v FROM v2
    ), sgn AS (
        SELECT CASE WHEN (SELECT v FROM v2n WHERE i = 1) < 0
                    THEN -1 ELSE 1 END AS sg
    )
    SELECT i AS dim, round(v * sg, 6) AS component FROM v2n, sgn
    """,
)
def sim_pca_power_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus (uncentered PCA)
    by {iters} fixed power iterations from the all-ones start — the
    corpus-level spectral statistic behind whitening/low-rank debiasing
    of embedding spaces. Sign-canonicalized (dim-1 component ≥ 0) so
    the direction is unique; fixed iteration count keeps the value
    deterministic and exactly oracle-checkable, like
    `sim_ann_kmeans_train`'s two Lloyd steps.

    Each iteration is the matrix-free product vᵀ ← Xᵀ(Xv): the row
    scores Xv are an in-row `aggregate` fold over zip_with(emb, v) —
    v enters as a 64-literal broadcast array, no join — and Xᵀs is ONE
    map-side-partial aggregation of 64 `sum(x[j]·s)` expressions (a
    single whole-stage-codegen pass; the shuffle carries one 64-double
    partial row per task — no posexplode of the corpus, which would
    shuffle rows×dims). The driver touches only the 64-double iterate
    between iterations (normalization), exactly the kmeans-centroid
    orchestration shape; the corpus is scanned {iters} times and never
    collected.
    """
    import math

    emb = catalog.load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )

    def xtxv(v: list[float]) -> list[float]:
        vlit = F.array(*[F.lit(float(c)) for c in v])
        s = F.aggregate(
            F.zip_with("x", vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        row = (
            emb.select(F.col("x"), s.alias("s"))
            .groupBy()
            .agg(
                *[
                    F.sum(F.col("x")[j] * F.col("s")).alias(f"w{j}")
                    for j in range(len(v))
                ]
            )
            .collect()[0]
        )  # 1 row × 64 doubles — the bounded iterate, as in kmeans
        return [row[f"w{j}"] for j in range(len(v))]

    v = [1.0] * 64
    for _ in range(_PCA_ITERS):
        w = xtxv(v)
        norm = math.sqrt(sum(c * c for c in w))
        v = [c / norm for c in w]
    sg = -1.0 if v[0] < 0 else 1.0
    rows = [(i + 1, c * sg) for i, c in enumerate(v)]
    return (
        spark.createDataFrame(rows, "dim int, component double")
        .select("dim", F.round("component", 6).alias("component"))
    )


# ---------------------------------------------------------------------------
# Mixture diagnostics — per-source token-distribution entropy and KL
# divergence against the corpus mixture.


@register(
    "corpus_mixture_entropy",
    oracle="""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ), c AS (
        SELECT source, token, count(*) AS n FROM toks GROUP BY source, token
    ), s AS (
        SELECT source, sum(n) AS ns FROM c GROUP BY source
    ), q AS (
        SELECT token, sum(n) AS nt FROM c GROUP BY token
    ), tot AS (
        SELECT sum(n) AS nn FROM c
    )
    SELECT c.source, CAST(s.ns AS BIGINT) AS n_tokens,
           round(-sum((c.n / s.ns) * ln(c.n / s.ns)), 4) AS entropy,
           round(sum((c.n / s.ns) * ln((c.n / s.ns) / (q.nt / tot.nn))), 4)
               AS kl_vs_corpus
    FROM c JOIN s USING (source) JOIN q USING (token), tot
    GROUP BY c.source, s.ns
    """,
)
def corpus_mixture_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution diagnostics: Shannon entropy of
    each source's unigram distribution and its KL divergence from the
    corpus mixture — the "is this source diverse / how far from the
    blend" dashboard behind mixture-weight tuning.

    Everything reduces to vocabulary-scale frames before any math: one
    corpus shuffle builds (source, token) counts with map-side
    partials; source totals, corpus token counts, and the grand total
    all derive from THAT aggregate (vocab-size inputs, never the
    corpus). The log-ratio sums shuffle |sources|×|vocab∩source| rows.
    All divisions are double-cast before ln so both engines compute
    identical expressions, rounded 4dp.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = c.groupBy("source").agg(F.sum("n").alias("ns"))
    q = c.groupBy("token").agg(F.sum("n").alias("nt"))
    tot = s.groupBy().agg(F.sum("ns").alias("nn"))
    p = F.col("n").cast("double") / F.col("ns").cast("double")
    pq = p / (F.col("nt").cast("double") / F.col("nn").cast("double"))
    return (
        c.join(F.broadcast(s), "source")
        .join(q, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "ns")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
            F.round(F.sum(p * F.log(pq)), 4).alias("kl_vs_corpus"),
        )
        .select(
            "source",
            F.col("ns").cast("bigint").alias("n_tokens"),
            "entropy",
            "kl_vs_corpus",
        )
    )


# ---------------------------------------------------------------------------
# Quality-filter ablation matrix — which filter combinations remove
# what, the governance readout every production filtering pipeline
# ships next to its kept/dropped counts.

_ABL_MIN_CHARS = 200
_ABL_MIN_TOKS = 40


@register(
    "pipeline_quality_ablation",
    oracle=f"""
    WITH flags AS (
        SELECT n_chars,
               n_chars >= {_ABL_MIN_CHARS} AS len_ok,
               len(string_split(text, ' ')) >= {_ABL_MIN_TOKS} AS tok_ok,
               lang = 'en' AS lang_ok
        FROM documents
    ), tot AS (SELECT count(*) AS total FROM flags)
    SELECT len_ok, tok_ok, lang_ok,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           round(count(*) / (SELECT CAST(total AS DOUBLE) FROM tot), 4)
               AS frac
    FROM flags
    GROUP BY len_ok, tok_ok, lang_ok
    ORDER BY len_ok, tok_ok, lang_ok
    """,
)
def pipeline_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter ablation matrix: the corpus partitioned by every
    combination of three quality gates (length ≥ {_ABL_MIN_CHARS}
    chars, ≥ {_ABL_MIN_TOKS} tokens, lang = en) with doc counts, char
    mass, and corpus fraction per cell — the readout that tells a
    pipeline owner which gate does the work, which are redundant, and
    what the intersection would keep, BEFORE committing a filter
    change to a 100 TB run (`pipeline_pretrain_filter` applies the
    gates; this op audits them).

    One map-side-combined shuffle on the 8-value flag-triple key; the
    corpus fraction divides by a 1-row total broadcast back (the
    scalar-subquery shape of `query_tpch_q11`). The flags are in-row
    codegen predicates — adding a gate adds a boolean column, not a
    pass.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    flags = docs.select(
        "n_chars",
        (F.col("n_chars") >= _ABL_MIN_CHARS).alias("len_ok"),
        (F.size(F.split("text", " ")) >= _ABL_MIN_TOKS).alias("tok_ok"),
        (F.col("lang") == "en").alias("lang_ok"),
    )
    tot = flags.groupBy().agg(F.count(F.lit(1)).alias("total"))
    return (
        flags.groupBy("len_ok", "tok_ok", "lang_ok")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "len_ok",
            "tok_ok",
            "lang_ok",
            "n_docs",
            "chars",
            F.round(F.col("n_docs") / F.col("total").cast("double"), 4).alias("frac"),
        )
        .orderBy("len_ok", "tok_ok", "lang_ok")
    )


# ---------------------------------------------------------------------------
# End-to-end prep chain — the composition showcase: filter → exact
# dedup → weighted mix → sequence packing as ONE declared query, the
# way a user actually wires these stages together.

_E2E_MIN_CHARS = 200
_E2E_MIN_TOKS = 40
_E2E_PACK = 2048
_E2E_SHARD = 256


@register(
    "pipeline_e2e_prep",
    oracle=f"""
    WITH filtered AS (
        SELECT doc_id, source, text, len(string_split(text, ' ')) AS toks
        FROM documents
        WHERE n_chars >= {_E2E_MIN_CHARS}
          AND len(string_split(text, ' ')) >= {_E2E_MIN_TOKS}
          AND lang = 'en'
    ), deduped AS (
        SELECT doc_id, source, toks FROM filtered
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ), banded AS (
        SELECT doc_id, source, toks,
               CAST(substr(source, 4) AS INT) // 5 AS band,
               substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8) AS h
        FROM deduped
    ), mixed AS (
        SELECT doc_id, source, toks FROM banded
        WHERE CASE band WHEN 0 THEN TRUE
                        WHEN 1 THEN h < '80000000'
                        WHEN 2 THEN h < '40000000'
                        ELSE h < '20000000' END
    ), packed AS (
        SELECT source, doc_id, toks,
               sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - toks AS cum_before
        FROM mixed
    )
    SELECT source, CAST(floor(cum_before / {_E2E_PACK}.0) AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
)
def pipeline_e2e_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE prep pipeline as one declared query: quality filter →
    exact dedup (md5 keep-first) → deterministic weighted source mix →
    {_E2E_PACK}-token sequence packing, reported as per-(source, bin)
    fills. Each stage is the semantics of its standalone operator
    (`pipeline_pretrain_filter`-style gates, `text_exact_dedup`,
    `pipeline_mix_weighted`, `pipeline_pack_sequences`) chained the
    way a user actually runs them — the composition is itself under
    the hash gate, so stage interfaces (what dedup hands to mix, what
    mix hands to packing) are verified, not assumed.

    The composed plan keeps each stage's scale property: gates are
    scan-time filters (pushed down), dedup shuffles 16-byte md5 keys
    (never text — text is dropped right after hashing), the mix is a
    map-only hash threshold, and the prefix sum is the range-sharded
    two-pass form — window cumsums only ever see one bounded
    (source, shard) slice, and only the |shards|-row offset table is
    windowed on the skewed source key. One corpus scan feeds the whole
    chain; total shuffles: dedup key + shard cumsum + offsets + final
    rollup — none carrying payload text.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    filtered = docs.where(
        (F.col("n_chars") >= _E2E_MIN_CHARS)
        & (toks >= _E2E_MIN_TOKS)
        & (F.col("lang") == "en")
    ).select("doc_id", "source", toks.alias("toks"), F.md5(F.col("text").cast("binary")).alias("th"))
    w_dedup = Window.partitionBy("th").orderBy("doc_id")
    deduped = (
        filtered.withColumn("_rn", F.row_number().over(w_dedup))
        .where(F.col("_rn") == 1)
        .select("doc_id", "source", "toks")
    )
    band = (F.expr("substring(source, 4)").cast("int") / F.lit(5)).cast("int")
    h = F.substring(
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.col("source")
            ).cast("binary")
        ),
        1,
        8,
    )
    mixed = (
        deduped.withColumn("band", band)
        .withColumn("h", h)
        .where(
            (F.col("band") == 0)
            | ((F.col("band") == 1) & (F.col("h") < "80000000"))
            | ((F.col("band") == 2) & (F.col("h") < "40000000"))
            | ((F.col("band") >= 3) & (F.col("h") < "20000000"))
        )
        .select("doc_id", "source", "toks", (F.col("doc_id") / _E2E_SHARD).cast("long").alias("shard"))
    )
    w_local = Window.partitionBy("source", "shard").orderBy("doc_id")
    local = mixed.withColumn("local_cum", F.sum("toks").over(w_local))
    w_shard = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        mixed.groupBy("source", "shard")
        .agg(F.sum("toks").alias("stot"))
        .withColumn("offset", F.sum("stot").over(w_shard) - F.col("stot"))
        .select("source", "shard", "offset")
    )
    packed = local.join(F.broadcast(offsets), ["source", "shard"]).withColumn(
        "cum_before", F.col("offset") + F.col("local_cum") - F.col("toks")
    )
    return (
        packed.groupBy(
            "source", F.floor(F.col("cum_before") / _E2E_PACK).alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )


# ---------------------------------------------------------------------------
# Corpus health report — the dataset-card numbers, one scan.


@register(
    "pipeline_corpus_report",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text, lang, source, n_chars,
               len(string_split(text, ' ')) AS toks,
               md5(text) AS th
        FROM documents
    )
    SELECT count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           count(DISTINCT source) AS n_sources,
           count(DISTINCT lang) AS n_langs,
           round(1.0 - count(DISTINCT th) / CAST(count(*) AS DOUBLE), 4)
               AS exact_dup_rate,
           round(avg(CAST(toks AS DOUBLE)), 4) AS mean_doc_tokens,
           round(count(*) FILTER (WHERE lang = 'en')
                 / CAST(count(*) AS DOUBLE), 4) AS pct_en,
           round(count(*) FILTER (WHERE n_chars >= {_ABL_MIN_CHARS}
                                    AND toks >= {_ABL_MIN_TOKS}
                                    AND lang = 'en')
                 / CAST(count(*) AS DOUBLE), 4) AS quality_pass_rate
    FROM base
    """,
)
def pipeline_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card summary every corpus release ships: doc and
    token totals, source/language diversity, exact-duplicate rate, and
    the pass rate of the `pipeline_quality_ablation` gate intersection
    — one row, ONE corpus scan.

    Everything reduces through a single aggregate: the duplicate rate
    is 1 − distinct(md5)/count (16-byte hashes into the distinct, not
    text), the distinct counts are two-phase (Expand is bounded by the
    4 distinct aggregates over one pass — acceptable here because the
    input is the corpus scan, not an exploded stream), and every ratio
    divides two counts from the SAME aggregate row, so both engines
    compute identical doubles. The report a 100 TB corpus pays one
    scan for, not a dashboard of six queries.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    base = docs.select(
        "lang",
        "source",
        "n_chars",
        toks.alias("toks"),
        F.md5(F.col("text").cast("binary")).alias("th"),
    )
    n = F.count(F.lit(1))
    return base.agg(
        n.alias("n_docs"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.lit(1.0) - F.countDistinct("th") / n.cast("double"), 4).alias(
            "exact_dup_rate"
        ),
        F.round(F.avg(F.col("toks").cast("double")), 4).alias("mean_doc_tokens"),
        F.round(
            F.count(F.when(F.col("lang") == "en", 1)) / n.cast("double"), 4
        ).alias("pct_en"),
        F.round(
            F.count(
                F.when(
                    (F.col("n_chars") >= _ABL_MIN_CHARS)
                    & (F.col("toks") >= _ABL_MIN_TOKS)
                    & (F.col("lang") == "en"),
                    1,
                )
            )
            / n.cast("double"),
            4,
        ).alias("quality_pass_rate"),
    )
