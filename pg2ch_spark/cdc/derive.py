"""Deterministic CDC log derivation from the `events` table.

pg2ch's change stream is ordered row-level DML framed by transactions
and positioned by LSN (`pkg/message`, `pkg/decoder` — SURVEY §1.1).
The fixtures carry no real WAL, so the driver contract (SURVEY §2.3 I)
derives an equivalent log deterministically; both engines compute the
identical derivation:

    op  = CASE event_type WHEN 'signup' THEN 'I'
                          WHEN 'error'  THEN 'D'
                          ELSE 'U' END
    key = user_id, ver = event_id (monotone, unique ≙ LSN)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg2ch_spark import catalog

# Shared CTE prefix for every group-I oracle.
CDC_CTE = """
WITH cdc AS (
    SELECT user_id AS key, event_id AS ver,
           CASE event_type WHEN 'signup' THEN 'I'
                           WHEN 'error'  THEN 'D'
                           ELSE 'U' END AS op,
           value, props
    FROM events
)
"""


def derive_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side of the shared derivation (≙ pg2ch R3 decode)."""
    ev = catalog.load(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    return ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("ver"),
        op.alias("op"),
        "value",
        "props",
    )
