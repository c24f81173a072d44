"""Shared intermediate-result caching policy.

One materialization primitive for every operator that fans an
intermediate into multiple plan branches: a spillable COLUMNAR persist,
forced eagerly. The two alternatives both failed at the 1000× probes:

- ``localCheckpoint`` stores Java-serialized RDD blocks — row-scale
  intermediates OOM the executor instead of spilling (c4f70d8);
- a LAZY persist leaves the optimizer planning every consumer from the
  pre-materialization estimate — a collapse groupBy's estimate reads
  tiny, the planner broadcast-hash-joins a shingle-scale cached table
  and dies building the broadcast (found by the salted 100× probe).

Cache lifetime: entries are plan-keyed, so re-invoking the same query
over the same input REUSES them (a warm-rerun win) while each distinct
input adds one entry. Long multi-query sessions must reclaim between
queries — ``bench.py`` calls ``spark.catalog.clearCache()`` between
keys, and any long-lived service embedding these operators should do
the same at its own workload boundaries (the entries are spillable, so
the cost of forgetting is disk, not an OOM — but it is unbounded disk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def fanout_partitions(df: DataFrame) -> int:
    """Partition count for a compute-fanout ``repartition`` ahead of a
    Python/kernel-heavy map stage: the session's actual parallelism
    (cores in local mode, total executor cores on a cluster), never a
    constant tuned to one machine shape (r8 — these sites were
    hard-coded 32, wrong both for the driver's lower-core scaling
    bench and for any real cluster)."""
    return df.sparkSession.sparkContext.defaultParallelism


def eager_persist(df: DataFrame) -> DataFrame:
    """Spillable columnar cache, materialized NOW (see module docstring
    for why eager and why persist — not localCheckpoint, not lazy).
    After count(), InMemoryRelation reports the cache's ACTUAL size, so
    consumers get SMJ vs broadcast decided on real bytes."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return df
