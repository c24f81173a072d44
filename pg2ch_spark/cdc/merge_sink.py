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
from pyspark.sql import Column, DataFrame, SparkSession, Window


# Sentinel for "horizon not precomputed": run_pipeline computes the
# per-micro-batch horizon ONCE and threads it to both the local sink
# and the remote batch hook, so the batch is not aggregate-scanned
# twice per consumer (ADVICE r6).
UNSET_HORIZON = object()


def truncate_horizon(df: DataFrame | None, ver_col: str):
    """Highest TRUNCATE-marker version in ``df`` (op == 'T'), or None.

    pg2ch R10: a truncate wipes everything ordered before it — the
    marker's version IS the horizon, and filtering rows to
    ``ver > horizon`` applies it exactly (the last marker subsumes
    earlier ones; markers sit AT their own horizon so they never
    persist). One narrow aggregate; replays re-filter idempotently.
    Shared by every sink family AND the daemon's remote ClickHouse
    fan-out, so horizon semantics cannot fork per consumer.

    Ordering contract: the horizon is applied from the INCOMING
    batch's markers and is not persisted, so convergence relies on
    Structured Streaming's commit order — replays re-deliver only the
    last uncommitted epoch, in order (the property the epoch-snapshot
    machinery in pipeline._CollapsingSink also depends on). A sink fed
    arbitrarily re-ordered history would need a persisted horizon;
    argmax-by-version alone is order-free, truncate is not."""
    if df is None or "op" not in df.columns:
        return None
    return df.where(F.col("op") == "T").agg(F.max(ver_col)).collect()[0][0]


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

    def _apply_truncate(
        self, incoming: DataFrame, current: DataFrame | None,
        tmax=UNSET_HORIZON,
    ) -> tuple[object, DataFrame, DataFrame | None]:
        """(tmax, incoming', current'): the R10 horizon from
        ``incoming``'s markers applied to both tiers (see
        :func:`truncate_horizon` for semantics). A caller that already
        computed the horizon passes it via ``tmax`` (None = "no
        marker") so the batch is not aggregate-scanned again."""
        if tmax is UNSET_HORIZON:
            tmax = truncate_horizon(incoming, self.ver_col)
        if tmax is not None:
            incoming = incoming.where(F.col(self.ver_col) > tmax)
            if current is not None:
                current = current.where(F.col(self.ver_col) > tmax)
        return tmax, incoming, current

    def merge(
        self, batch_df: DataFrame, epoch_id: int | None = None,
        tmax=UNSET_HORIZON,
    ) -> None:
        """foreachBatch entry point: union existing state + batch, keep the
        max-version row per key, commit atomically. Re-running the same
        batch (at-least-once replay) is a no-op by construction.
        TRUNCATE markers in the batch propagate (R10): state and batch
        rows at or before the last marker's version are dropped.
        ``tmax``: optionally precomputed horizon (see _apply_truncate)."""
        current = self.state()
        _, batch_df, current = self._apply_truncate(batch_df, current, tmax)
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
        # The pending-batch count is DISK-backed (a dot-file inside the
        # buffer dir — invisible to Spark's listing): the daemon builds
        # a FRESH sink per pass, and an in-memory counter would reset to
        # 0 every pass, so a continuously-active table below
        # merge_every batches PER PASS would never reach the threshold
        # and its buffer would grow without bound. Worst case of a
        # crash between parquet append and counter write is one
        # undercounted batch — the next merge or the inactivity timer
        # still collapses it (argmax is count-insensitive).
        self._counter_path = os.path.join(self.buffer_path, ".batches")
        self._batches_buffered = self._read_counter()
        self.merges_done = 0

    def _read_counter(self) -> int:
        try:
            with open(self._counter_path) as f:
                return int(f.read().strip() or 0)
        except (OSError, ValueError):
            return 0

    def _write_counter(self, n: int) -> None:
        tmp = self._counter_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(n))
        os.replace(tmp, self._counter_path)

    def merge(
        self, batch_df: DataFrame, epoch_id: int | None = None,
        tmax=UNSET_HORIZON,
    ) -> None:
        """O(batch): append to the buffer tier; merge only at threshold.
        ``tmax`` is accepted for signature parity but unused — the
        buffered tiers apply the horizon at FLUSH time over ALL batches
        buffered since the last merge (a marker in batch 2 must also
        filter batch 1's already-buffered rows)."""
        batch_df.write.mode("append").parquet(self.buffer_path)
        self._batches_buffered += 1
        self._write_counter(self._batches_buffered)
        if self._batches_buffered >= self.merge_every:
            self.flush()

    def flush(self) -> None:
        """Replacing-merge the buffer tier into the main state table.
        TRUNCATE markers buffered since the last flush apply here: the
        last marker's version filters both tiers (R10)."""
        if not os.path.exists(self.buffer_path):
            return
        buf = self.spark.read.parquet(self.buffer_path)
        current = super().state()
        _, buf, current = self._apply_truncate(buf, current)
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


class BucketedMergeSink(BufferedMergeSink):
    """Buffer→merge sink whose compaction is O(touched state), not
    O(total state) — the production MERGE shape.

    `BufferedMergeSink` amortizes the per-batch cost, but its flush
    still rewrites the WHOLE main state: at 100 TB of keyed state a
    micro-batch touching 0.1% of keys would rewrite 100 TB. Real
    engines avoid that by file-level pruning (Delta/Iceberg MERGE INTO
    rewrites only data files containing matched keys; ClickHouse merges
    per-part). This sink implements the same idea directly: main state
    lives in ``n_buckets`` fixed hash buckets of the key
    (``pmod(xxhash64(key), n)``, one parquet dir ``b<i>`` each — plain
    names, so no partition-discovery column leaks into the schema), and
    a flush

    1. collapses the buffer to its argmax-per-key delta,
    2. lists the delta's DISTINCT buckets (≤ n_buckets ints — the only
       driver-side data, bounded by construction),
    3. replacing-merges delta + existing state FOR THOSE BUCKETS ONLY
       in one Spark job (staging dir partitioned by bucket),
    4. promotes each touched bucket with the two-rename protocol.

    Untouched buckets are never read, never written. At scale
    n_buckets is sized so a bucket ≈ a compaction unit (e.g. 4096
    buckets over 100 TB → ~25 GB rewrites per touched bucket).

    Convergence under at-least-once replay is inherited: the bucket
    renames are not atomic as a group, but a crash anywhere before the
    buffer truncate re-runs the same flush, and re-merging an
    already-merged delta is a no-op by argmax(ver). Per-bucket ``.old``
    recovery mirrors ``ReplacingMergeSink.state()``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        ver_col: str,
        merge_every: int = 4,
        n_buckets: int = 16,
    ):
        super().__init__(spark, path, key_col, ver_col, merge_every)
        self.n_buckets = n_buckets
        self.buckets_rewritten = 0  # cumulative, for pruning assertions

    def _bucket_expr(self) -> Column:
        """THE routing hash — the probe's touched-set and the actual
        bucket assignment must come from this one expression or they
        silently drift (and the flush would merge against the wrong
        existing buckets)."""
        return F.pmod(F.xxhash64(self.key_col), F.lit(self.n_buckets))

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn("_b", self._bucket_expr())

    def _bucket_dir(self, b: int) -> str:
        return os.path.join(self.path, f"b{b}")

    def _recover_bucket(self, b: int) -> str | None:
        """Promote a crash-window ``.old`` back, return the dir if it
        holds data."""
        bdir = self._bucket_dir(b)
        if not os.path.exists(bdir) and os.path.exists(bdir + ".old"):
            os.rename(bdir + ".old", bdir)
        return bdir if os.path.exists(bdir) else None

    def flush(self) -> None:
        if not os.path.exists(self.buffer_path):
            return
        buf = self.spark.read.parquet(self.buffer_path)
        # ONE probe job computes the R10 truncate horizon AND the
        # delta's touched-bucket set (r8: previously two driver jobs —
        # a horizon aggregate plus a distinct-buckets collect; both are
        # aggregates of the same buffer scan, and latest-per-key keeps
        # every key, so the buffer's bucket set IS the delta's).
        # collect_set is bounded by n_buckets ints — driver-bounded.
        aggs = [F.collect_set(self._bucket_expr()).alias("_bs")]
        if "op" in buf.columns:
            aggs.append(
                F.max(
                    F.when(F.col("op") == "T", F.col(self.ver_col))
                ).alias("_t")
            )
        probe = buf.agg(*aggs).collect()[0]
        tmax = probe["_t"] if "op" in buf.columns else None
        if tmax is not None:
            # a truncate touches EVERY bucket: the O(touched) pruning
            # rightly escalates to a full-state pass for the one
            # operation whose semantics are "all state before me"
            # (current is filtered below, after the touched-bucket read)
            buf = buf.where(F.col(self.ver_col) > tmax)
            touched = list(range(self.n_buckets))
        else:
            touched = sorted(probe["_bs"])
        delta = self._bucket(self._latest_per_key(buf))
        existing = [
            d for d in (self._recover_bucket(b) for b in touched) if d is not None
        ]
        merged = delta
        if existing:
            current = self._bucket(self.spark.read.parquet(*existing))
            if tmax is not None:
                current = current.where(F.col(self.ver_col) > tmax)
            merged = current.unionByName(delta)
        staging = self.path + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        (
            self._latest_per_key(merged)
            .repartition(max(len(touched), 1), "_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(staging)
        )
        os.makedirs(self.path, exist_ok=True)
        for b in touched:
            src = os.path.join(staging, f"_b={b}")
            if not os.path.exists(src):
                if tmax is not None:
                    # truncate wiped this bucket entirely: remove it
                    # (idempotent on replay — the buffer re-flushes
                    # until its own truncate below commits)
                    bdir = self._bucket_dir(b)
                    shutil.rmtree(bdir + ".old", ignore_errors=True)
                    if os.path.exists(bdir):
                        shutil.rmtree(bdir, ignore_errors=True)
                        self.buckets_rewritten += 1
                continue  # defensive: argmax keeps ≥1 row per delta key
            bdir = self._bucket_dir(b)
            old = bdir + ".old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(bdir):
                os.rename(bdir, old)
            os.rename(src, bdir)
            shutil.rmtree(old, ignore_errors=True)
            self.buckets_rewritten += 1
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(self.buffer_path, ignore_errors=True)
        self._batches_buffered = 0
        self.merges_done += 1

    def state(self) -> DataFrame | None:
        self.flush()
        dirs = [
            d
            for d in (self._recover_bucket(b) for b in range(self.n_buckets))
            if d is not None
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)
