"""CH-style merge sink for foreachBatch (SURVEY §4.3.1).

pg2ch's flush-and-merge path (R8/R9/R12: in-memory buffer → CH buffer
table → `INSERT INTO main SELECT … FROM buffer` + truncate) maps to
Structured Streaming's foreachBatch: each micro-batch is merged
idempotently into a keyed state table. The checkpoint dir supplies the
at-least-once replay guard pg2ch gets from kvstorage-persisted LSNs —
replays converge because the merge is an argmax by version
(ReplacingMergeTree semantics, `pkg/tableengines/replacingMergeTree.go`).

Locally the state table is a parquet dir rewritten per batch. At scale
the identical ``merge`` plan targets a transactional sink (Delta/Iceberg
MERGE INTO, or a ClickHouse JDBC writer feeding a real
ReplacingMergeTree) — only ``_commit`` changes, not the dataflow.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


class ReplacingMergeSink:
    """Idempotent merge-by-key sink: state converges to argmax(ver) per key."""

    def __init__(self, spark: SparkSession, path: str, key_col: str, ver_col: str):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.ver_col = ver_col

    def state(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            # Crash recovery: _commit renames current -> .old before
            # promoting staging. A failure between the two renames
            # leaves only .old — and the streaming checkpoint has
            # already acked earlier batches, so losing it would break
            # the at-least-once-but-convergent contract. Promote it
            # back; the in-flight batch replays from the checkpoint.
            old = self.path + ".old"
            if os.path.exists(old):
                os.rename(old, self.path)
            else:
                return None
        return self.spark.read.parquet(self.path)

    def merge(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """foreachBatch entry point: union existing state + batch, keep the
        max-version row per key, commit atomically. Re-running the same
        batch (at-least-once replay) is a no-op by construction."""
        current = self.state()
        merged = batch_df if current is None else current.unionByName(batch_df)
        w = Window.partitionBy(self.key_col).orderBy(F.col(self.ver_col).desc())
        final = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        self._commit(final)

    def _commit(self, df: DataFrame) -> None:
        """Two-rename commit; any single crash point loses at most the
        in-flight batch (replayed from the checkpoint): before the first
        rename the current state is intact; between renames ``state()``
        recovers from ``.old``; after the second rename the stale
        ``.old`` is swept here on the next commit."""
        tmp = self.path + ".staging"
        df.write.mode("overwrite").parquet(tmp)
        old = self.path + ".old"
        shutil.rmtree(old, ignore_errors=True)  # stale leftover from a crash
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
