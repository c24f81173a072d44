"""Group K (text) — LLM-data-pipeline text operators (SURVEY §2.3 K).

The training-data-pipeline surface over `documents`: exact dedup,
token statistics, per-source quality stats, TF-IDF, MinHash-LSH
near-dedup. All are pure DataFrame ops — tokenization is `split` +
`explode` (JVM-side), hashing is `md5`/`xxhash64` (JVM-side); no
Python in any hot path.

Scale notes (100 TB of documents):
- exact dedup: hash-groupBy on md5(text) — one shuffle on a 16-byte
  key instead of the full text; keep-first by doc_id makes the kept
  set deterministic.
- token stats / tf-idf: explode multiplies rows ~100× — partial
  aggregation (map-side combine) collapses them before the shuffle.
- MinHash-LSH: signatures are 16 min-aggregates per doc (one narrow
  shuffle by doc), banding turns O(n²) similarity into equi-joins on
  band hashes — the standard shuffle-friendly near-dup plan. The
  verify step computes exact Jaccard only for candidate pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, token) — fixture texts are clean single-space."""
    return docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )


@register(
    "text_exact_dedup",
    oracle="""
    WITH h AS (SELECT doc_id, lang, md5(text) AS th FROM documents),
    kept AS (
        SELECT doc_id, lang FROM h
        QUALIFY row_number() OVER (PARTITION BY th ORDER BY doc_id) = 1
    )
    SELECT lang, count(*) AS n_docs FROM kept GROUP BY lang
    """,
)
def text_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on md5(text), keep lowest doc_id; per-lang kept counts.

    (sf0.01 has zero duplicate texts so the counts equal raw per-lang
    counts; sf0.1 has 8 dups — exercised in bench.)
    """
    docs = catalog.load(spark, sf_dir, "documents")
    w = Window.partitionBy("th").orderBy("doc_id")
    kept = (
        docs.withColumn("th", F.md5(F.col("text").cast("binary")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "text_token_stats",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ), counted AS (
        SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token
    )
    SELECT lang, token, n FROM counted
    QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) <= 20
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens per language by (count DESC, token) — D1 tie-break."""
    docs = catalog.load(spark, sf_dir, "documents")
    counted = _tokens(docs).groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 20)
        .select("lang", "token", "n")
    )


@register(
    "text_stats_per_source",
    oracle="""
    SELECT source, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars,
           string_agg(DISTINCT lang, '|' ORDER BY lang) AS langs
    FROM documents GROUP BY source
    """,
)
def text_stats_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus stats (the 'quality dashboard' aggregate)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.array_join(F.sort_array(F.collect_set("lang")), "|").alias("langs"),
    )


@register(
    "text_tfidf_top",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(ln(1 + tf.tf) * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS score
        FROM tf JOIN df USING (term), n
        WHERE tf.doc_id < 10
    )
    SELECT doc_id, term, score FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 5
    """,
)
def text_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (ln(1+tf)·ln(N/df)) top-5 terms for a 10-doc sample.

    Ranked on the *rounded* score (then term) so both engines rank
    identical values — raw ln() may differ in the last ulp across
    libm implementations.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.where(F.col("doc_id") < 10)
        .join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.log(F.lit(1) + F.col("tf")) * F.log(F.col("n").cast("double") / F.col("df")),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 5)
        .select("doc_id", "term", "score")
    )


N_HASHES = 16
# 2 bands × 8 rows: LSH s-curve threshold ≈ (1/2)^(1/8) ≈ 0.92 — tuned to
# the 0.9 verify threshold below.
N_BANDS = 2
_MH_PRIME = 1_000_000_007  # double-hashing modulus; h1+15*h2 < 2^36, no overflow


def _minhash_oracle() -> str:
    from pg2ch_spark.llm.neardup import _SHINGLE_SQL

    rpb = N_HASHES // N_BANDS
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band, hs[{b * rpb + 1}:{(b + 1) * rpb}] AS bk FROM vec"
        for b in range(N_BANDS)
    )
    return f"""
    WITH {_SHINGLE_SQL},
    tok AS (
        SELECT doc_id, g,
            CAST(list_sum(list_transform(range(1, 9),
                j -> (strpos('0123456789abcdef', substr(md5(g), j, 1)) - 1)
                     * CAST(16 ** (8 - j) AS BIGINT))) AS BIGINT) AS h1,
            CAST(list_sum(list_transform(range(9, 17),
                j -> (strpos('0123456789abcdef', substr(md5(g), j, 1)) - 1)
                     * CAST(16 ** (16 - j) AS BIGINT))) AS BIGINT) AS h2
        FROM sh
    ),
    sig AS (
        SELECT doc_id, s.i, min((h1 + s.i * h2) % {_MH_PRIME}) AS h
        FROM tok, unnest(range(0, {N_HASHES})) AS s(i)
        GROUP BY doc_id, s.i
    ),
    vec AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM sig GROUP BY doc_id),
    bands AS (
{band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS ni
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b AND y.g = x.g
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(ni AS DOUBLE) / (sx.n + sy.n - ni), 4) AS jaccard
    FROM inter
    JOIN sz sx ON sx.doc_id = doc_a
    JOIN sz sy ON sy.doc_id = doc_b
    WHERE CAST(ni AS DOUBLE) / (sx.n + sy.n - ni) >= 0.9
    """


@register("text_near_dedup_minhash", oracle=_minhash_oracle())
def text_near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs, exact-Jaccard verified.

    Pipeline (all JVM-side, no UDFs):
      1. distinct (doc_id, shingle) pairs — word 3-grams, NOT unigram
         tokens: the fixture vocabulary is ~30 words, so unigram token
         sets are nearly identical corpus-wide and unigram-LSH banding
         degenerates to an all-pairs join (measured: 25.5s at sf0.1;
         shingles ~2s). Shingle features also make this directly the
         approximate sibling of `text_near_dedup_ngram_jaccard` (exact
         Jaccard) and `text_near_dedup_simhash` (hamming LSH).
      2. 16 minhash signatures by double hashing (Kirsch–Mitzenmacher):
         h_i(g) = (h1 + i·h2) mod p with h1/h2 the two 32-bit halves of
         md5(g) — the one hash both engines compute identically, which
         is what upgrades this operator from rows-only (r1, xxhash64)
         to a fully EXACT cross-engine oracle.
      3. 2 bands × 8 rows: band key = the 8-signature vector itself
         (array equality — no second hash needed)
      4. equi-self-join on (band, vector) → candidate pairs (a < b)
      5. exact Jaccard on shingle sets for candidates only; keep ≥ 0.9

    Scale: step 4 replaces the O(n²) all-pairs comparison with a
    shuffle on band keys; step 5 touches only candidates. This is the
    canonical 100 TB near-dedup plan (cf. MinHashLSH in Spark ML —
    reimplemented here to stay in pure SQL expressions).

    Exact-dup collapsed (round 5) like the simhash/jaccard siblings:
    signatures and Jaccard are pure functions of the text, so banding
    and verification run over one representative per distinct text and
    member products expand exactly afterwards (identical texts band-
    agree with jaccard 1.0). Duplicate-dense corpora otherwise go
    quadratic inside every band bucket — the 100× replication probe
    ran >10 min pre-collapse.
    """
    from pg2ch_spark.llm.neardup import (
        _collapse_exact,
        _expand_member_products,
        _shingles,
        eager_persist,
    )

    docs = catalog.load(spark, sf_dir, "documents")
    reps, clusters = _collapse_exact(docs)
    # toks feeds FOUR branches (signatures, both verify sides, sizes).
    # r1 measured recompute as cheaper, but that was with the old
    # shuffle-based _shingles; with in-row distinct shingles the
    # materialized table wins: checkpointed 1.5s stable vs 1.5-4.1s
    # GC-bimodal recomputing the explode 4x (sf0.1). eager_persist, NOT
    # localCheckpoint: the table is shingle-scale (row-scale once texts
    # are mostly unique) — an RDD-block checkpoint of that OOMed the
    # heap in text_lm_logprob's 1000x probe, and a LAZY persist left the
    # planner broadcast-joining this table off its tiny pre-agg estimate
    # (the salted 100x probe died building the broadcast).
    toks = eager_persist(_shingles(reps).withColumnRenamed("g", "token"))

    hashed = toks.select(
        "doc_id",
        "token",
        F.expr("CAST(conv(substr(md5(CAST(token AS BINARY)), 1, 8), 16, 10) AS BIGINT)").alias("h1"),
        F.expr("CAST(conv(substr(md5(CAST(token AS BINARY)), 9, 8), 16, 10) AS BIGINT)").alias("h2"),
    )
    sig_cols = [
        F.min((F.col("h1") + i * F.col("h2")) % _MH_PRIME).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    sigs = hashed.groupBy("doc_id").agg(*sig_cols)

    rows_per_band = N_HASHES // N_BANDS
    band_struct = ", ".join(
        "struct({b} AS band, array({cols}) AS bk)".format(
            b=b,
            cols=", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(N_BANDS)
    )
    bands = sigs.select(
        "doc_id", F.explode(F.expr(f"array({band_struct})")).alias("bb")
    ).select("doc_id", "bb.band", "bb.bk")

    candidates = (
        bands.select(F.col("doc_id").alias("doc_a"), "band", "bk")
        .join(bands.select(F.col("doc_id").alias("doc_b"), "band", "bk"), ["band", "bk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    # Exact verify through per-doc shingle-HASH arrays (r8 — the same
    # shape `_rep_pair_scores` uses): ONE groupBy over toks builds
    # (doc, sorted-hash-array, n), and each candidate pair intersects
    # two arrays in-row. The previous form shuffled the shingle-scale
    # toks table through the candidate join twice and then joined a
    # size table twice more — 3 shingle-scale shuffles and 4 joins vs
    # 1 + 2 now. n_common = |hash-set intersection| is exact up to a
    # cross-doc xxhash64 collision WITHIN one candidate pair
    # (P ≈ n²/2⁶⁴ ≈ 1e-17/pair — the bound already accepted for the
    # exact-jaccard siblings); toks rows are distinct per doc, so the
    # collected list is the shingle set.
    hashed_sets = toks.groupBy("doc_id").agg(
        F.collect_list(F.xxhash64("token")).alias("_h"),
        F.count(F.lit(1)).alias("n_tok"),
    )
    ga = hashed_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("_h").alias("_ha"),
        F.col("n_tok").alias("n_a"),
    )
    gb = hashed_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("_h").alias("_hb"),
        F.col("n_tok").alias("n_b"),
    )
    jac = (
        candidates.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_ha", "_hb")).alias("n_common"),
            "n_a",
            "n_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
    )
    rep_pairs = jac.where(F.col("jaccard") >= 0.9)

    # Expansion back to the per-doc contract: identical texts share all
    # bands and have jaccard exactly 1.0, but only when they shingle at
    # all (<3-word texts produce no signature and never pair).
    return _expand_member_products(
        rep_pairs,
        clusters,
        "doc_a",
        "doc_b",
        {"jaccard": F.lit(1.0)},
        eligible=clusters.join(
            toks.select(F.col("doc_id").alias("rep")).distinct(), "rep", "left_semi"
        ),
    )


# ---------------------------------------------------------------------------
# Skip-gram PMI — collocation mining: which token pairs co-occur more
# than chance within a ±2 window.

_PMI_WINDOW = 2
_PMI_MIN_N = 5
_PMI_TOPK = 30


def _pmi_pairs_sql() -> str:
    unions = "\n        UNION ALL\n".join(
        f"""        SELECT toks[i] AS w_a, toks[i + {d}] AS w_b
        FROM t, unnest(range(1, len(toks) + 1 - {d})) AS r{d}(i)"""
        for d in range(1, _PMI_WINDOW + 1)
    )
    return unions


@register(
    "text_skipgram_pmi",
    oracle=f"""
    WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents
        WHERE length(text) > 0
    ), pairs AS (
{_pmi_pairs_sql()}
    ), pc AS (
        SELECT w_a, w_b, count(*) AS n_ab FROM pairs GROUP BY w_a, w_b
    ), uni AS (
        SELECT unnest(toks) AS w FROM t
    ), uc AS (
        SELECT w, count(*) AS n FROM uni GROUP BY w
    ), tots AS (
        SELECT (SELECT CAST(sum(n_ab) AS DOUBLE) FROM pc) AS p_tot,
               (SELECT CAST(sum(n) AS DOUBLE) FROM uc) AS t_tot
    )
    SELECT w_a, w_b, n_ab,
           round(ln(n_ab / tt.p_tot / (ua.n / tt.t_tot) / (ub.n / tt.t_tot)), 4)
               AS pmi
    FROM pc
    JOIN uc ua ON ua.w = w_a
    JOIN uc ub ON ub.w = w_b
    CROSS JOIN tots tt
    WHERE n_ab >= {_PMI_MIN_N}
    QUALIFY row_number() OVER (
        ORDER BY round(ln(n_ab / tt.p_tot / (ua.n / tt.t_tot) / (ub.n / tt.t_tot)), 4)
                 DESC, w_a, w_b) <= {_PMI_TOPK}
    """,
)
def text_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PMI_TOPK} collocations by pointwise mutual information over
    ±{_PMI_WINDOW}-token skip-grams (count ≥ {_PMI_MIN_N}): PMI =
    ln(P(a,b) / (P(a)P(b))) — the corpus statistic behind phrase
    induction and collocation-aware tokenizers, sitting beside
    `text_bpe_merge_candidates`' raw adjacency counts.

    Pairs for each offset d come from `zip_with` over shifted slices
    (codegen, the BPE-bigram idiom) and partial-aggregate map-side, so
    the shuffle carries co-occurring TYPE pairs, not token instances;
    the unigram table is vocab-scale and broadcasts onto the pair
    table. The PMI expression is written with the identical
    left-associative division chain on both engines, and `ln` over
    bit-identical doubles agrees (the `corpus_mixture_entropy`
    precedent); ordering uses the ROUNDED pmi with a full tie-break,
    so the top-k is engine-stable. TakeOrderedAndProject — no global
    sort.
    """
    docs = catalog.load(spark, sf_dir, "documents").where(F.length("text") > 0)
    toks = F.split("text", " ")
    sides = []
    for d in range(1, _PMI_WINDOW + 1):
        sides.append(
            docs.select(
                F.explode(
                    F.zip_with(
                        F.slice(toks, 1, F.greatest(F.size(toks) - d, F.lit(0))),
                        F.slice(toks, 1 + d, F.greatest(F.size(toks) - d, F.lit(0))),
                        lambda a, b: F.struct(a.alias("w_a"), b.alias("w_b")),
                    )
                ).alias("p")
            ).select("p.w_a", "p.w_b")
        )
    pairs = sides[0]
    for s in sides[1:]:
        pairs = pairs.unionByName(s)
    pc = pairs.groupBy("w_a", "w_b").agg(F.count(F.lit(1)).alias("n_ab")).where(
        F.col("n_ab") >= _PMI_MIN_N
    )
    uni = docs.select(F.explode(toks).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("n")
    )
    # totals BEFORE the support filter (the oracle's sum over pc is the
    # unfiltered pair total — recompute the same way here)
    p_tot = pairs.agg(F.count(F.lit(1)).cast("double").alias("p_tot"))
    t_tot = uni.agg(F.sum("n").cast("double").alias("t_tot"))
    ua = uni.select(F.col("w").alias("w_a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("w").alias("w_b"), F.col("n").alias("n_b"))
    pmi = F.round(
        F.log(
            F.col("n_ab")
            / F.col("p_tot")
            / (F.col("n_a") / F.col("t_tot"))
            / (F.col("n_b") / F.col("t_tot"))
        ),
        4,
    )
    return (
        pc.join(F.broadcast(ua), "w_a")
        .join(F.broadcast(ub), "w_b")
        .crossJoin(F.broadcast(p_tot))
        .crossJoin(F.broadcast(t_tot))
        .select("w_a", "w_b", "n_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w_a", "w_b")
        .limit(_PMI_TOPK)
    )


# ---------------------------------------------------------------------------
# Zipf-exponent fit — the corpus-health statistic for token frequency
# distributions (natural corpora fit slope ≈ −1; synthetic/templated
# text shows up as a flat or broken rank curve).


@register(
    "text_zipf_fit",
    oracle="""
    WITH uc AS (
        SELECT w, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
            WHERE length(text) > 0
        ) GROUP BY w
    ), ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, w) AS DOUBLE)) AS lx,
               ln(CAST(n AS DOUBLE)) AS ly
        FROM uc
    ), stats AS (
        SELECT count(*) AS k, sum(lx) AS sx, sum(ly) AS sy,
               sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
        FROM ranked
    )
    SELECT CAST(k AS BIGINT) AS vocab_size,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS zipf_slope,
           round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k, 4)
               AS intercept
    FROM stats
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token-frequency curve: least-squares
    slope of ln(freq) against ln(rank) plus the intercept — the
    dataset-card distribution check (natural language ≈ −1; templated
    or synthetic text bends the curve; this fixture's ~30-word
    near-uniform vocabulary reads shallow by construction).

    One token shuffle builds the vocab table; the rank window runs
    over VOCAB-scale rows (tied counts break on the token so the rank
    — and therefore the fit — is engine-stable), and the closed-form
    least-squares needs only five scalar sums. Float discipline: lx/ly
    are ln of identical integers (the `corpus_mixture_entropy`
    precedent), the sums run over vocab-scale values rounded nowhere,
    and the slope/intercept expressions are written with identical
    association on both engines, rounded 4dp.
    """
    docs = catalog.load(spark, sf_dir, "documents").where(F.length("text") > 0)
    uc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_rank = Window.orderBy(F.col("n").desc(), "w")
    ranked = uc.select(
        F.log(F.row_number().over(w_rank).cast("double")).alias("lx"),
        F.log(F.col("n").cast("double")).alias("ly"),
    )
    stats = ranked.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return stats.select(
        F.col("k").cast("bigint").alias("vocab_size"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 4).alias(
            "intercept"
        ),
    )
