"""Declared-query registry — the t2 contract surface.

Every operator in SURVEY §2.3 registers itself here as a callable
``(spark, sf_dir) -> DataFrame`` plus (usually) a DuckDB oracle SQL
string. ``__spark_entry__.queries()``/``oracle_sql()`` just re-export
these dicts.

The ``register`` decorator wraps each query so that required runtime
confs (UTC timezone, nanos-as-long) are applied even when the driver
hands us a fresh session.
"""

from __future__ import annotations

import functools
import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query (and its DuckDB oracle SQL, if exact-checkable)."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            catalog.configure(spark)
            catalog.tune(spark)
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return wrapped

    return deco


def load_all() -> None:
    """Import every operator module so registrations run (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Registration order is part of the external contract: downstream
    # correctness tooling checks queries in registration order and may
    # cap how many it verifies per run. Groups whose results have not
    # yet been externally verified register FIRST (cdc, streaming, llm,
    # udfs, scalar fns), then the long-verified relational core
    # (SURVEY §2.3 groups A..G).
    # Registration order is part of the external contract: the driver
    # verifies queries in registration order and may cap how many it
    # checks per run. Newest-first — groups that have never received a
    # driver-green CORRECTNESS row register before groups verified in
    # earlier rounds.
    # Round-3 additions (never driver-checked):
    from pg2ch_spark.operators import tpch  # noqa: F401
    from pg2ch_spark.llm import corpus  # noqa: F401
    from pg2ch_spark.operators import reshape  # noqa: F401
    from pg2ch_spark.llm import heavyhitters  # noqa: F401
    from pg2ch_spark.cdc import pipeline_query  # noqa: F401
    # Round-2 additions:
    from pg2ch_spark.operators import extended  # noqa: F401
    from pg2ch_spark.operators import analytics  # noqa: F401
    # Round-1 groups, never checked in the round-1 sweep (cdc/stream/
    # llm/udf/fn), then the long-verified relational core (A..G):
    from pg2ch_spark.cdc import engines  # noqa: F401
    from pg2ch_spark.streaming import queries as streaming_queries  # noqa: F401
    from pg2ch_spark.llm import text, similarity, neardup, quality, multimodal  # noqa: F401
    from pg2ch_spark.udfs import declared  # noqa: F401
    from pg2ch_spark.functions import scalar  # noqa: F401
    from pg2ch_spark.operators import (  # noqa: F401
        scans,
        projection,
        joins,
        aggregates,
        windows,
        sorts,
        setops,
    )

    _LOADED = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
