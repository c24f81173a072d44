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

    def _latest_per_key(self, df: DataFrame) -> DataFrame:
        """ReplacingMergeTree semantics: argmax(ver) row per key."""
        w = Window.partitionBy(self.key_col).orderBy(F.col(self.ver_col).desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def merge(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """foreachBatch entry point: union existing state + batch, keep the
        max-version row per key, commit atomically. Re-running the same
        batch (at-least-once replay) is a no-op by construction."""
        current = self.state()
        merged = batch_df if current is None else current.unionByName(batch_df)
        self._commit(self._latest_per_key(merged))

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


class BufferedMergeSink(ReplacingMergeSink):
    """Two-tier buffer→merge sink — pg2ch's actual flush topology.

    The reference inserts every flush into a ClickHouse *buffer table*
    and only merges into the main table after ``merge_threshold``
    flushes (R8/R9). The single-tier ``ReplacingMergeSink`` re-reads
    and rewrites the WHOLE state per micro-batch — convergent but
    O(total state × n_batches). Here each batch is an O(batch) parquet
    append to the buffer dir; the O(state) replacing merge runs every
    ``merge_every`` batches (and on demand), so the amortized write
    cost per batch is O(batch + state/merge_every).

    Convergence under at-least-once replay is inherited: a replayed
    batch appends duplicate rows to the buffer, and the argmax-by-
    version merge collapses them. Crash windows: a crash between the
    merge commit and the buffer truncate re-merges the same buffer —
    idempotent; a crash mid-append loses only the in-flight batch,
    which the streaming checkpoint replays.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        ver_col: str,
        merge_every: int = 4,
    ):
        super().__init__(spark, path, key_col, ver_col)
        self.buffer_path = path + ".buffer"
        self.merge_every = merge_every
        self._batches_buffered = 0
        self.merges_done = 0

    def merge(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """O(batch): append to the buffer tier; merge only at threshold."""
        batch_df.write.mode("append").parquet(self.buffer_path)
        self._batches_buffered += 1
        if self._batches_buffered >= self.merge_every:
            self.flush()

    def flush(self) -> None:
        """Replacing-merge the buffer tier into the main state table."""
        if not os.path.exists(self.buffer_path):
            return
        buf = self.spark.read.parquet(self.buffer_path)
        current = super().state()
        merged = buf if current is None else current.unionByName(buf)
        self._commit(self._latest_per_key(merged))
        shutil.rmtree(self.buffer_path, ignore_errors=True)
        self._batches_buffered = 0
        self.merges_done += 1

    def state(self) -> DataFrame | None:
        """Merged view: forces a flush so reads see all buffered batches
        (pg2ch reads only the main table; its readers tolerate buffer
        lag — a FINAL-style read here keeps the test contract exact)."""
        self.flush()
        return super().state()
