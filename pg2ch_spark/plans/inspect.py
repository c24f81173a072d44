"""Helpers over `df._jdf.queryExecution()` for plan assertions.

All functions take a DataFrame and parse the *executed* physical plan
string — the same text `df.explain()` prints — so assertions match
what actually runs (post-AQE re-planning is visible on re-execution;
these read the initial physical plan, which is what the static checks
below need).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_columns(df: DataFrame) -> list[str]:
    """Column names read by the first parquet FileScan (ReadSchema)."""
    plan = physical_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [f.split(":")[0] for f in m.group(1).split(",") if f]


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?!SinglePartition)(?:hash|range|RoundRobin)", plan))


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)
