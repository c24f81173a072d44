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

# Driver-verification ordering — ROTATING, derived from recorded
# evidence age (VERDICT r6 item 4). The external correctness harness
# checks queries in the order ``queries()`` yields them and caps how
# many it verifies per round (observed: 50). Earlier rounds hand-curated
# priority tuples; now that every key has at least one driver
# CORRECTNESS row, the order derives from the committed evidence
# artifacts themselves: keys with NO recorded row (newly added this
# round) come first, then keys by OLDEST most-recent evidence —
# round-robin re-verification with max staleness ceil(N/50) rounds
# (property-tested in tests/test_correctness.py). No manual tuple to
# forget to rotate.

DRIVER_WINDOW = 50  # keys the driver verifies per round (observed cap)


def evidence_rounds() -> dict[str, int]:
    """key → latest round with a committed driver CORRECTNESS row."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ev: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue  # a malformed artifact must not break the registry
        for k, row in data.items():
            # Only a row that actually PASSED counts as evidence: a
            # null rows_match (errored run, or a no-oracle key the
            # harness can only execute) must rotate back to the front of
            # the window, not to the back as if freshly proven (ADVICE
            # r7) — and a rows_match=false (verified MISMATCH) must
            # re-surface next round exactly like an errored one, not be
            # rotated to the back as fresh evidence (ADVICE r8).
            if not (isinstance(row, dict) and row.get("rows_match") is True):
                continue
            ev[k] = max(ev.get(k, -1), rnd)
    return ev


def _prioritized(d: dict) -> dict:
    """Reorder a registry dict: never-checked keys first, then oldest
    evidence first (name-tiebroken for determinism)."""
    ev = evidence_rounds()
    return {k: d[k] for k in sorted(d, key=lambda k: (ev.get(k, -1), k))}


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
    # Import order never dictates what the driver sees first:
    # queries()/oracle_sql() reorder via the evidence-age rotation
    # (_prioritized above). Imports here just need to cover every
    # module so all registrations run.
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
    # Round-4 additions:
    from pg2ch_spark.llm import pipelineops  # noqa: F401
    from pg2ch_spark.operators import tpch_partsupp  # noqa: F401
    from pg2ch_spark.operators import behavior  # noqa: F401
    from pg2ch_spark.operators import summaries  # noqa: F401
    from pg2ch_spark.operators import basket  # noqa: F401
    # Round-7 additions:
    from pg2ch_spark.cdc import typed_query  # noqa: F401

    _LOADED = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return _prioritized(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return _prioritized(ORACLES)
