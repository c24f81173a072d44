"""Corpus-quality operators, round 3: repetition signals and PII scrub.

Training-data pipelines filter documents on *repetition* (Rae et al.'s
Gopher rules: duplicate-token fraction, most-frequent-n-gram fraction)
and scrub sensitive tokens before training. Both are per-document,
embarrassingly parallel map work — the scale-correct plan touches each
document once, in-row, with zero shuffles before the final tiny
rollup. These complement the near-dedup family (llm/neardup.py):
near-dedup removes cross-document redundancy, repetition scoring
removes *within*-document degeneracy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filter inputs)


@register(
    "text_repetition_signals",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE length(text) > 0
    ),
    base AS (
        SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS n_distinct
        FROM toks
    ),
    bigrams AS (
        SELECT doc_id, t[CAST(i AS BIGINT)] || ' ' || t[CAST(i AS BIGINT) + 1] AS bg
        FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)
        WHERE len(t) >= 2
    ),
    bg_counts AS (
        SELECT doc_id, bg, count(*) AS c FROM bigrams GROUP BY doc_id, bg
    ),
    bg_top AS (
        SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM bg_counts GROUP BY doc_id
    )
    SELECT b.doc_id,
           round(1.0 - CAST(b.n_distinct AS DOUBLE) / b.n, 6) AS dup_token_frac,
           round(CAST(t.top_c AS DOUBLE) / t.n_bg, 6) AS top_bigram_frac
    FROM base b JOIN bg_top t ON b.doc_id = t.doc_id
    ORDER BY b.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition: duplicate-token
    fraction (1 − distinct/total) and the most-frequent-bigram's share
    of all bigrams. Everything is in-row higher-order-function work —
    ``array_distinct`` for the first signal; for the second, sort the
    bigram array and run-length-scan it with ``aggregate`` (the mode
    of a sorted array is the longest run) — so the plan is a single
    map over the corpus with NO shuffle at any scale; only the
    per-document scalar triple moves afterward. The oracle computes
    the same mode by explode + group-count, the plan Spark avoids."""
    docs = catalog.load(spark, sf_dir, "documents").where(F.length("text") > 0)
    # Stage each array as a named column so it is evaluated ONCE per
    # row — referencing split(...) inside a lambda would re-tokenize
    # the document per element (O(n²) per doc; measured 8.4s→fast).
    staged = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 2)
        .withColumn(
            "sorted_bg",
            F.expr(
                "array_sort(transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))"
            ),
        )
    )
    # mode count of a sorted array = longest run of equal neighbours:
    # fold (prev, run, best) over the sorted bigrams.
    top_c = F.expr(
        """
        aggregate(
          sorted_bg,
          struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best),
          (acc, x) -> struct(
              x AS prev,
              CASE WHEN acc.prev IS NOT NULL AND x = acc.prev
                   THEN acc.run + 1 ELSE 1 END AS run,
              greatest(acc.best,
                  CASE WHEN acc.prev IS NOT NULL AND x = acc.prev
                       THEN acc.run + 1 ELSE 1 END) AS best),
          acc -> acc.best)
        """
    )
    n = F.size("toks")
    return staged.select(
        "doc_id",
        F.round(
            1.0 - F.size(F.array_distinct("toks")).cast("double") / n, 6
        ).alias("dup_token_frac"),
        F.round(top_c.cast("double") / (n - 1), 6).alias("top_bigram_frac"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Dictionary PII scrub


_DENYLIST = ("key", "token")  # stand-in for a real PII dictionary


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH scrubbed AS (
        SELECT source,
               string_split(text, ' ') AS t,
               list_transform(string_split(text, ' '),
                   x -> CASE WHEN x IN ('{_DENYLIST[0]}', '{_DENYLIST[1]}')
                             THEN '<PII>' ELSE x END) AS red
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(list_filter(t,
               x -> x IN ('{_DENYLIST[0]}', '{_DENYLIST[1]}')))) AS BIGINT)
               AS n_redactions,
           count(DISTINCT array_to_string(red, ' ')) AS n_distinct_redacted
    FROM scrubbed
    GROUP BY source
    ORDER BY source
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-based PII scrub: replace denylisted tokens with
    '<PII>' and report, per source, document count, total redactions,
    and distinct post-scrub texts (scrubbing can merge documents — the
    dedup interaction a real pipeline must account for). The scrub and
    the redaction count are in-row ``transform``/``filter`` HOFs
    (map-only, denylist inlined into the codegen'd expression — at a
    realistic dictionary size it would broadcast instead); only the
    per-source rollup shuffles, and the distinct-count shuffles a
    16-byte md5 of the scrubbed text, never the text itself."""
    deny = F.array(*[F.lit(d) for d in _DENYLIST])
    toks = F.split(F.col("text"), " ")
    red = F.transform(
        toks, lambda x: F.when(F.array_contains(deny, x), F.lit("<PII>")).otherwise(x)
    )
    n_red = F.size(F.filter(toks, lambda x: F.array_contains(deny, x)))
    return (
        catalog.load(spark, sf_dir, "documents")
        .select(
            "source",
            n_red.alias("nr"),
            F.md5(F.array_join(red, " ")).alias("red_md5"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nr").cast("bigint").alias("n_redactions"),
            F.count_distinct("red_md5").alias("n_distinct_redacted"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy matching — edit-distance near-dup for SHORT strings
# (titles, names): the dedup primitive n-gram Jaccard is too coarse for.

_FUZZY_MAXDIST = 3
_FUZZY_BLOCK = 8  # chars of prefix shared by candidate pairs


@register(
    "text_fuzzy_blocked_join",
    oracle=f"""
    WITH keys AS (
        SELECT doc_id, substring(text, 1, 40) AS s,
               substring(text, 1, {_FUZZY_BLOCK}) AS blk
        FROM documents WHERE length(text) >= {_FUZZY_BLOCK}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
    FROM keys a JOIN keys b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.s, b.s) <= {_FUZZY_MAXDIST}
    ORDER BY doc_a, doc_b
    """,
)
def text_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs over 40-char prefixes, BLOCKED on
    the first {blk} characters: candidate pairs only form inside a
    block (equi-join — never an all-pairs Levenshtein, which is the
    classic fuzzy-join scale killer), then the exact distance filters
    within the block. Recall bound is explicit: pairs differing inside
    their first {blk} chars are missed — production raises recall by
    OR-ing additional blocking keys (suffix, sorted-token prefix),
    each another linear equi-join. Levenshtein is codegen'd JVM in
    Spark and native in DuckDB — identical integer outputs."""
    from pg2ch_spark.llm.neardup import _collapse_on, _expand_member_products

    keys = (
        catalog.load(spark, sf_dir, "documents")
        .where(F.length("text") >= _FUZZY_BLOCK)
        .select("doc_id", F.substring("text", 1, 40).alias("s"))
    )
    # Exact-dup collapse on the 40-char prefix (round 5): the distance
    # is a pure function of the two prefixes, so the in-block
    # Levenshtein runs once per DISTINCT prefix pair and member
    # products expand exactly afterwards (identical prefixes pair at
    # dist 0). Duplicate-dense corpora otherwise go quadratic inside
    # every block — the 1000× replication probe ground past 10 min
    # pre-collapse (10⁶× in-block pairs, each an O(40²) distance).
    clusters = _collapse_on(keys, "doc_id", F.col("s"), ("s",))
    a = clusters.select(
        F.col("rep").alias("doc_a"),
        F.col("s").alias("sa"),
        F.substring("s", 1, _FUZZY_BLOCK).alias("blk"),
    )
    b = clusters.select(
        F.col("rep").alias("doc_b"),
        F.col("s").alias("sb"),
        F.substring("s", 1, _FUZZY_BLOCK).alias("blk"),
    )
    rep_pairs = (
        a.join(b, "blk")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("sa", "sb").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= _FUZZY_MAXDIST)
    )
    # No trailing orderBy: the driver compare is order-insensitive and
    # a global range sort of the pair output is output-sized waste
    # (2.5B rows at the 1000× duplication probe).
    return _expand_member_products(
        rep_pairs,
        clusters.select("rep", "members"),
        "doc_a",
        "doc_b",
        {"dist": F.lit(0).cast("int")},
        eligible=clusters,  # every ≥block-length doc has a prefix
    )


# ---------------------------------------------------------------------------
# Sequence packing (round 4) — the pretraining batch-prep step: lay the
# corpus out into fixed token-budget context windows.

_PACK_BUDGET = 2048  # tokens per packed sequence (context window)
_PACK_SHARD = 256  # doc_ids per range shard (see scale note below)


@register(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS toks
        FROM documents WHERE length(text) > 0
    ), c AS (
        SELECT source, doc_id, toks,
               sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - toks AS cum_before
        FROM t
    )
    SELECT source, CAST(floor(cum_before / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens
    FROM c GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (per source, in doc_id order) into contiguous
    {_PACK_BUDGET}-token bins — the sequence-packing layout step of a
    pretraining pipeline — and report each bin's fill.

    A doc's bin is floor(tokens_before_it / budget), i.e. a running
    prefix sum over the corpus. The naive plan — one window per source
    — puts an ENTIRE source in a single task (a source is a constant
    like 'web'/'books': at 100 TB that is one multi-TB partition). So
    the prefix sum is computed distributed, the textbook two-pass way:

    1. range-shard on doc_id (shard = doc_id div 256) and cumsum
       WITHIN each (source, shard) — thousands of parallel,
       bounded-size window tasks;
    2. per-shard token totals (tiny: one row per shard) get their own
       prefix sum per source, and the resulting shard offsets
       broadcast-join back — local cumsum + shard offset = exact
       global prefix sum, because (shard, doc_id) order IS doc_id
       order under range sharding.

    Only the shard-offset table (|shards| rows) is ever windowed on
    the skewed source key; the corpus itself shuffles on the uniform
    (source, shard) key. Result verified identical to the oracle's
    single-window formulation."""
    docs = (
        catalog.load(spark, sf_dir, "documents")
        .where(F.length("text") > 0)
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).alias("toks"),
            (F.col("doc_id") / _PACK_SHARD).cast("long").alias("shard"),
        )
    )
    w_local = Window.partitionBy("source", "shard").orderBy("doc_id")
    local = docs.withColumn("local_cum", F.sum("toks").over(w_local))
    w_shard = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        docs.groupBy("source", "shard")
        .agg(F.sum("toks").alias("stot"))
        .withColumn("offset", F.sum("stot").over(w_shard) - F.col("stot"))
        .select("source", "shard", "offset")
    )
    packed = local.join(F.broadcast(offsets), ["source", "shard"]).withColumn(
        "cum_before", F.col("offset") + F.col("local_cum") - F.col("toks")
    )
    return (
        packed.groupBy(
            "source",
            F.floor(F.col("cum_before") / _PACK_BUDGET).alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )
