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

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog
from pg2ch_spark.registry import register

_MG_SIZE = 200
_SUPPORT = 0.01


def _mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries of size _MG_SIZE over the tokens of each Arrow batch
    stream (one summary per partition). Counters are summary-local
    lower bounds, NOT exact counts — only candidacy leaves here."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for toks in pdf["toks"]:
            for t in toks:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < _MG_SIZE:
                    counters[t] = 1
                else:  # decrement-all step (amortized via dict rebuild)
                    counters = {k: c - 1 for k, c in counters.items() if c > 1}
    yield pd.DataFrame({"token": list(counters.keys())})


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
    candidates = docs.mapInPandas(_mg_summaries, "token string").distinct()
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
