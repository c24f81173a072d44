"""Group L — the declared UDF/UDAF/UDTF surface (SURVEY §2.3 L).

UDFs are the slow path and the rest of the engine avoids them; this
module is the *declared* escape hatch, demonstrating each flavor with
its correct Spark mechanism:

- scalar pandas UDF (Arrow-vectorized, SCALAR eval)
- grouped-agg pandas UDF (UDAF)
- ``mapInPandas`` (UDTF-shaped: 1 row → N rows)
- plain row-at-a-time Python UDF (kept to document the non-vectorized
  path; ~10-100× slower than the pandas variants — never use in a hot
  path at scale)

Scale note: pandas UDFs move data JVM↔Python via Arrow record batches
(`spark.sql.execution.arrow.maxRecordsPerBatch` controls batch shape);
the per-batch overhead is amortized, but a built-in expression is
always preferred when one exists — compare ``udf_python_scalar``'s
oracle, which is just lower+replace.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from pg2ch_spark import catalog
from pg2ch_spark.registry import register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER ()) / stddev_samp(c_acctbal) OVER (), 6) AS z
    FROM customer
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score of account balance via a vectorized (Arrow) pandas UDF.

    The stats are precomputed with a distributed agg and broadcast in;
    the UDF itself is pure elementwise arithmetic on pandas Series.
    """

    @pandas_udf("double")
    def zscore(x: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
        return (x - mu) / sigma

    c = catalog.load(spark, sf_dir, "customer")
    stats = c.agg(
        F.avg("c_acctbal").alias("mu"), F.stddev_samp("c_acctbal").alias("sigma")
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .select(
            "c_custkey",
            F.round(zscore("c_acctbal", "mu", "sigma"), 6).alias("z"),
        )
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_discount) / sum(l_discount), 2) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-weighted average price per return flag via grouped-agg
    pandas UDFs (UDAF flavor), salted: l_returnflag has 3 values, and a
    grouped-agg pandas UDF materializes each group as ONE in-memory
    pandas Series in one Python worker — ~200M rows (3.2 GB) per group
    at the 1000× probe, which ground past 10 minutes. The Python fold
    (the declared contract) now runs per (flag, salt) over 256 bounded
    partials — weighted mean decomposes exactly into Σpw/Σw, so the
    JVM-side combine of the partial sums is the same statistic."""

    @pandas_udf("double")
    def dot_sum(price: pd.Series, weight: pd.Series) -> float:
        return float((price * weight).sum())

    @pandas_udf("double")
    def w_sum(weight: pd.Series) -> float:
        return float(weight.sum())

    li = catalog.load(spark, sf_dir, "lineitem")
    partials = li.groupBy(
        "l_returnflag", F.pmod("l_orderkey", F.lit(256)).alias("_salt")
    ).agg(
        dot_sum("l_extendedprice", "l_discount").alias("_pw"),
        w_sum("l_discount").alias("_w"),
    )
    return partials.groupBy("l_returnflag").agg(
        F.round(F.sum("_pw") / F.sum("_w"), 2).alias("wavg_price")
    )


@register(
    "udf_table_mapinpandas",
    oracle="""
    SELECT doc_id, string_split(text, ' ')[i] AS token, CAST(i AS INT) AS position
    FROM (
        SELECT doc_id, text,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
        FROM documents
    )
    """,
)
def udf_table_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped row expansion: documents → (doc_id, token, position)
    via mapInPandas (Arrow-batched; each input batch yields one output
    frame — no per-row Python)."""

    def explode_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            lens = toks.str.len()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(lens).to_numpy(),
                    "token": [t for lst in toks for t in lst],
                    "position": [i for n in lens for i in range(1, n + 1)],
                }
            )

    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(explode_tokens, "doc_id long, token string, position int")


@register(
    "udf_python_scalar",
    oracle="SELECT p_partkey, replace(lower(p_name), ' ', '-') AS slug FROM part",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the documented slow path — the oracle
    shows the built-in equivalent a real pipeline should use)."""
    slug = F.udf(lambda s: s.lower().replace(" ", "-"), "string")
    p = catalog.load(spark, sf_dir, "part")
    return p.select("p_partkey", slug("p_name").alias("slug"))


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           upper(substr(text, 1, 8)) AS head
    FROM documents
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth Arrow entry point, `mapInArrow`: batches arrive as
    raw `pyarrow.RecordBatch` and every transformation below runs in
    Arrow COMPUTE KERNELS (C++), never materializing pandas objects —
    the zero-copy fast path `text_vocab_heavy_hitters` uses internally
    for its 36.8M tokens/s Misra-Gries loop, here under the declared
    oracle gate as an API-surface contract. byte length, token count
    (split + list_value_length), and an uppercased prefix all come
    from `pyarrow.compute`; ASCII fixture text makes byte and char
    semantics coincide (strlen ≙ utf8 length here by construction —
    the multimodal ops' documented payload contract)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernels(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int64(),
                    ),
                    pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 8)),
                ],
                names=["doc_id", "n_bytes", "n_tokens", "head"],
            )

    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        kernels, "doc_id long, n_bytes long, n_tokens long, head string"
    )
