"""Group K (text analysis, extended) — language-ID, quality scoring,
token counting, document fingerprinting (SURVEY §2.3 K).

The per-document text-analysis family of a training-data pipeline:
every operator is pure JVM-side DataFrame code (split / explode /
regexp / md5 / window min — no Python in the hot path) and carries an
exact DuckDB oracle.

Scale notes (100 TB of documents):
- lang-ID: the trained profile is tiny (5 langs × 40 bigrams) —
  broadcast-joined against per-doc bigram sets; the expensive explode
  is collapsed by partial aggregation before any shuffle.
- quality scoring: fully per-row (no shuffle at all) — higher-order
  array functions over the token array, one pass.
- fingerprinting: winnowing needs a per-doc positional sort; the
  window is partitioned by doc_id, so it parallelizes per document
  and never sorts globally.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.caching import fanout_partitions
from pg2ch_spark.registry import register

# ---------------------------------------------------------------------------
# Language identification — corpus-trained character-bigram profiles

_TRAIN_MOD = 5  # doc_id % 5 == 0 → holdout; else training
_PROFILE_TOP = 40


@register(
    "text_lang_id",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, lang, substr(text, i, 2) AS bg
        FROM documents, unnest(range(1, len(text))) AS t(i)
    ),
    profile AS (
        SELECT lang AS plang, bg FROM (
            SELECT lang, bg, count(*) AS n FROM grams
            WHERE doc_id % {_TRAIN_MOD} != 0
            GROUP BY lang, bg
        ) QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, bg) <= {_PROFILE_TOP}
    ),
    test_grams AS (
        SELECT DISTINCT doc_id, lang, bg FROM grams WHERE doc_id % {_TRAIN_MOD} = 0
    ),
    hits AS (
        SELECT t.doc_id, t.lang, p.plang, count(*) AS nhit
        FROM test_grams t JOIN profile p ON t.bg = p.bg
        GROUP BY t.doc_id, t.lang, p.plang
    ),
    pred AS (
        SELECT doc_id, lang, plang AS pred_lang FROM hits
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY nhit DESC, plang) = 1
    )
    SELECT lang, pred_lang, count(*) AS n_docs FROM pred GROUP BY lang, pred_lang
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram language ID: train char-bigram profiles per lang on 80% of
    the corpus, classify the held-out 20% by profile-hit argmax; output
    the confusion matrix (lang, pred_lang, n_docs).

    All-integer scoring (distinct-bigram hits against a top-40 profile)
    with deterministic tie-breaks, so the cross-engine check is exact.
    """
    # Guard: Spark's sequence(1, n) DESCENDS ([1,0]) when n < 1, so a
    # 1-char doc would emit spurious bigrams (substring at pos 0) where
    # the oracle's range(1, len) emits none. Dropping sub-bigram docs
    # matches the oracle exactly on any corpus.
    # repartition: the fixture is one input split; the per-row bigram
    # generation below is the hot loop and must run on all cores (at
    # 100 TB the input splits provide this for free).
    base = catalog.load(spark, sf_dir, "documents")
    docs = base.where(F.length("text") >= 2).repartition(fanout_partitions(base))

    train = docs.where(F.col("doc_id") % _TRAIN_MOD != 0).select(
        "lang",
        F.explode(F.sequence(F.lit(1), F.length("text") - 1)).alias("i"),
        "text",
    ).select("lang", F.expr("substring(text, CAST(i AS INT), 2)").alias("bg"))
    counted = train.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bg"))
    profile = (
        counted.withColumn("_rn", F.row_number().over(wp))
        .where(F.col("_rn") <= _PROFILE_TOP)
        .select(F.col("lang").alias("plang"), "bg")
    )

    # Per-doc DISTINCT bigrams computed in-row (array_distinct before
    # the explode) — the first implementation exploded every position
    # and ran a full-stream .distinct() shuffle for the same result.
    test_grams = docs.where(F.col("doc_id") % _TRAIN_MOD == 0).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, length(text) - 1),"
                "                         i -> substring(text, i, 2)))"
            )
        ).alias("bg"),
    )
    hits = (
        test_grams.join(F.broadcast(profile), "bg")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count(F.lit(1)).alias("nhit"))
    )
    wh = Window.partitionBy("doc_id").orderBy(F.col("nhit").desc(), F.col("plang"))
    pred = (
        hits.withColumn("_rn", F.row_number().over(wh))
        .where(F.col("_rn") == 1)
        .select("lang", F.col("plang").alias("pred_lang"))
    )
    return pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# Quality scoring — length / stopword / vocabulary-diversity heuristics

_STOPWORDS = ("a", "the")


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), m AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_uniq,
               len(list_filter(toks, x -> x IN {_STOPWORDS!r})) AS n_stop
        FROM t
    )
    SELECT doc_id, n_tokens, n_uniq, n_stop,
           floor((0.5 * (CAST(n_uniq AS DOUBLE) / n_tokens)
               + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
               + 0.2 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)) * 10000 + 0.5)
               / 10000 AS quality
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score: vocabulary diversity (unique-token
    ratio), stopword ratio, and a capped length prior — the standard
    cheap pre-filter before expensive pipeline stages. No shuffle:
    higher-order array functions, one map-side pass.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    stop_pred = " OR ".join(f"x = '{s}'" for s in _STOPWORDS)
    m = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.expr(f"size(filter(toks, x -> {stop_pred}))").alias("n_stop"),
    )
    # floor(q*1e4 + 0.5)/1e4, NOT round(q, 4): the ratio mix makes
    # exact .xxxx5 half-way values common, and on those Spark's
    # decimal-repr HALF_UP and DuckDB's binary round disagree (found at
    # sf0.1: one doc off by 1e-4). Both engines compute bit-identical q
    # (same IEEE op order), so the floor form ties identically.
    q = (
        0.5 * (F.col("n_uniq").cast("double") / F.col("n_tokens"))
        + 0.3 * (1.0 - F.col("n_stop").cast("double") / F.col("n_tokens"))
        + 0.2 * (F.least(F.col("n_tokens"), F.lit(100)).cast("double") / 100.0)
    )
    quality = (F.floor(q * 10000 + 0.5) / 10000).alias("quality")
    return m.select("doc_id", "n_tokens", "n_uniq", "n_stop", quality)


# ---------------------------------------------------------------------------
# Token counting — whitespace vs BPE-ish regex tokenization

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "text_token_count_bpe",
    oracle=f"""
    WITH m AS (
        SELECT source, n_chars,
               len(string_split(text, ' ')) AS ws_toks,
               len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_toks,
               len(list_filter(string_split(text, ' '), x -> len(x) > 5)) AS long_toks
        FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(ws_toks) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe_toks) AS BIGINT) AS bpe_tokens,
           CAST(sum(long_toks) AS BIGINT) AS long_tokens,
           round(CAST(sum(n_chars) AS DOUBLE) / sum(bpe_toks), 4) AS chars_per_tok
    FROM m GROUP BY source
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source: whitespace tokens vs a BPE-ish regex
    tokenizer (letter runs | digit runs | single punctuation), plus
    long-token counts and chars-per-token — the budget arithmetic of an
    LLM data pipeline. Regex runs JVM-side (`regexp_extract_all`)."""
    docs = catalog.load(spark, sf_dir, "documents")
    m = docs.select(
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("ws_toks"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("bpe_toks"),
        F.expr("size(filter(split(text, ' '), x -> length(x) > 5))").alias("long_toks"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_toks").alias("ws_tokens"),
        F.sum("bpe_toks").alias("bpe_tokens"),
        F.sum("long_toks").alias("long_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.sum("bpe_toks"), 4).alias("chars_per_tok"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting — winnowing over rolling character shingles

_SHINGLE_K = 8  # character shingle length
_WINNOW_W = 4  # window of consecutive shingle hashes; min is the fingerprint


@register(
    "text_fingerprint",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, i, md5(substr(text, i, {_SHINGLE_K})) AS h,
               len(text) - {_SHINGLE_K} + 1 AS n_sh
        FROM documents, unnest(range(1, len(text) - {_SHINGLE_K} + 2)) AS t(i)
    ),
    wins AS (
        SELECT doc_id, i, n_sh,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS fp
        FROM sh
    )
    SELECT doc_id, count(DISTINCT fp) AS n_fp, min(fp) AS fp_min
    FROM wins WHERE i <= n_sh - {_WINNOW_W} + 1
    GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints: rolling {k}-char shingles, md5 per
    shingle, minimum over each window of {w} consecutive hashes; a
    document's fingerprint set is the distinct window minima
    (Schleimer et al.'s winnowing — guarantees any shared substring of
    length ≥ k+w-1 yields a shared fingerprint). Output: fingerprint
    count and lexicographic minimum per document.

    Winnowing is per-document — map-only, ZERO shuffles. The kernel is
    an Arrow `mapInArrow` batch (VERDICT r6 item 3): the previous
    interpreted-HOF form evaluated a Catalyst md5 expression PER
    CHARACTER POSITION (1.25 B interpreted calls at 1000× → 401 s,
    736× ratio — ~12 MB/s/node of corpus throughput); this one runs
    hashlib's C md5 per shingle and vectorizes the window minima /
    distinct in numpy (memcmp-correct S16 byte comparisons), producing
    BIT-IDENTICAL hashes — the md5-per-shingle contract the oracle pins
    — at ~33 s projected for the same 1000× probe.
    """
    # Guard: docs shorter than k+w-1 chars have no complete winnowing
    # window — the oracle's WHERE clause drops them. The repartition
    # spreads the single local parquet split across cores; at 100 TB
    # input splits provide the fan-out for free.
    base = catalog.load(spark, sf_dir, "documents")
    docs = (
        base.where(F.length("text") >= _SHINGLE_K + _WINNOW_W - 1)
        .repartition(fanout_partitions(base))
        .select("doc_id", "text")
    )
    k, w = _SHINGLE_K, _WINNOW_W

    def kernel(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        md5 = hashlib.md5
        for batch in batches:
            texts = batch.column(1).to_pylist()
            n_fp: list[int] = []
            fp_min: list[str] = []
            for t in texts:
                n = len(t) - k + 1
                # one digest buffer, viewed as fixed 16-byte items:
                # numpy S-dtype comparisons are memcmp over the full
                # width (embedded/trailing NULs included — verified in
                # tests/test_random_universe.py), so hex and byte
                # order agree and the minima match the oracle's
                hs = np.frombuffer(
                    b"".join([md5(t[i : i + k].encode()).digest() for i in range(n)]),
                    dtype="S16",
                )
                m = n - w + 1
                a = hs[0:m]
                for s in range(1, w):
                    b = hs[s : s + m]
                    a = np.where(b < a, b, a)
                u = np.unique(a)
                n_fp.append(len(u))
                # np.bytes_ strips trailing NULs on extraction — pad back
                fp_min.append(bytes(u[0]).ljust(16, b"\0").hex())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pa.array(n_fp, pa.int64()),
                    pa.array(fp_min, pa.string()),
                ],
                ["doc_id", "n_fp", "fp_min"],
            )

    return docs.mapInArrow(kernel, "doc_id bigint, n_fp bigint, fp_min string")


# ---------------------------------------------------------------------------
# Unigram language-model scoring (perplexity-style quality filter)


@register(
    "text_lm_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), freq AS (
        SELECT token, CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM toks) AS p
        FROM toks GROUP BY token
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(ln(f.p)), 4) AS avg_logp
    FROM toks t JOIN freq f USING (token)
    GROUP BY t.doc_id
    """,
)
def text_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM scoring: corpus token frequencies → per-document mean
    log-probability (the monotone core of perplexity = exp(−avg_logp)).
    The classic cheap LM-based quality filter: gibberish scores far
    below fluent text. The frequency table is vocabulary-sized —
    broadcast; the token stream aggregates map-side first.

    avg(ln p) is a sum of ~40 doubles ≈ −200: cross-engine sum-order
    and libm-ulp differences are ~1e-13, invisible at 4dp (D2).

    Dataflow: TWO streaming explodes, ZERO row-scale materialization.
    An earlier version localCheckpointed the per-(doc, token) counts so
    three plan branches could share them — at 1000× (60M docs) that
    eager checkpoint held ~2.4B Java-serialized rows in RDD blocks and
    OOMed the heap. Both consumers collapse map-side on their own:
    the frequency branch partial-aggregates straight down to VOCAB
    scale, and the scoring branch joins the exploded stream against
    the broadcast vocab and partial-aggregates by doc_id (documents
    are row-contiguous, so per-task partials stay doc-sized). Re-reading
    the corpus once more is scan-bound; holding it is what killed the
    job.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.select(F.sum("c").alias("tot"))
    p_tbl = freq.crossJoin(F.broadcast(total)).select(
        "token", (F.col("c").cast("double") / F.col("tot")).alias("p")
    )
    return (
        toks.join(F.broadcast(p_tbl), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(F.log("p")), 4).alias("avg_logp"),
        )
    )
