"""Engine-semantics property tests (SURVEY §5.2): random op sequences →
collapsing/replacing invariants, merge-sink replay idempotence."""

from __future__ import annotations

import random
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import Window


def _random_cdc(spark, seed: int, n: int = 300, n_keys: int = 12):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(n_keys), ver, rng.choice("IUD"), round(rng.uniform(0, 100), 2))
        for ver in range(n)
    ]
    return spark.createDataFrame(rows, "key long, ver long, op string, value double")


def _replacing_final(cdc):
    w = Window.partitionBy("key").orderBy(F.col("ver").desc())
    return cdc.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def test_replacing_final_is_argmax(spark):
    cdc = _random_cdc(spark, seed=1)
    got = {r.key: (r.ver, r.value) for r in _replacing_final(cdc).collect()}
    expected: dict[int, tuple[int, float]] = {}
    for r in cdc.collect():  # driver-side oracle on tiny data
        if r.key not in expected or r.ver > expected[r.key][0]:
            expected[r.key] = (r.ver, r.value)
    assert got == expected


def test_collapsing_net_sign_is_inserts_minus_deletes(spark):
    """The ±1 expansion must balance: per key, sum(sign) == #I − #D."""
    cdc = _random_cdc(spark, seed=2)
    w = Window.partitionBy("key").orderBy("ver")
    with_prev = cdc.withColumn("prev_value", F.lag("value").over(w))
    plus = with_prev.where(F.col("op").isin("I", "U")).select("key", F.lit(1).alias("sign"))
    minus = with_prev.where(F.col("op").isin("U", "D")).select("key", F.lit(-1).alias("sign"))
    net = plus.unionByName(minus).groupBy("key").agg(F.sum("sign").alias("net"))
    counts = cdc.groupBy("key").agg(
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("i"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("d"),
    )
    joined = net.join(counts, "key")
    bad = joined.where(F.col("net") != F.col("i") - F.col("d")).count()
    assert bad == 0


def test_merge_sink_replay_idempotent(spark):
    """Replaying the same batch (at-least-once delivery) must not change
    state — pg2ch's convergence argument (SURVEY §1.1)."""
    from pg2ch_spark.cdc.merge_sink import ReplacingMergeSink

    cdc = _random_cdc(spark, seed=3)
    path = tempfile.mkdtemp(prefix="pg2ch_sinktest_") + "/state"
    sink = ReplacingMergeSink(spark, path, key_col="key", ver_col="ver")

    half = cdc.where(F.col("ver") < 150)
    sink.merge(half, epoch_id=0)
    sink.merge(half, epoch_id=0)  # replay
    sink.merge(cdc.where(F.col("ver") >= 150), epoch_id=1)
    sink.merge(cdc.where(F.col("ver") >= 150), epoch_id=1)  # replay

    got = sorted(
        (r.key, r.ver, r.value) for r in sink.state().select("key", "ver", "value").collect()
    )
    want = sorted(
        (r.key, r.ver, r.value)
        for r in _replacing_final(cdc).select("key", "ver", "value").collect()
    )
    assert got == want


def test_merge_sink_out_of_order_batches_converge(spark):
    """Batches applied out of LSN order still converge to argmax(ver)."""
    from pg2ch_spark.cdc.merge_sink import ReplacingMergeSink

    cdc = _random_cdc(spark, seed=4)
    path = tempfile.mkdtemp(prefix="pg2ch_sinktest_") + "/state"
    sink = ReplacingMergeSink(spark, path, key_col="key", ver_col="ver")
    sink.merge(cdc.where(F.col("ver") >= 150))  # later data first
    sink.merge(cdc.where(F.col("ver") < 150))
    got = sink.state().count()
    want = _replacing_final(cdc).count()
    assert got == want


def test_buffered_sink_converges_like_single_tier(spark):
    """Two-tier buffer→merge (pg2ch R8/R9) must reach the same final
    state as the per-batch sink under replayed, out-of-order batches —
    while committing the O(state) merge only every merge_every batches
    (per-batch cost is an O(batch) buffer append)."""
    from pg2ch_spark.cdc.merge_sink import BufferedMergeSink, ReplacingMergeSink

    cdc = _random_cdc(spark, seed=5)
    base = tempfile.mkdtemp(prefix="pg2ch_sinktest_")
    single = ReplacingMergeSink(spark, base + "/single", key_col="key", ver_col="ver")
    two_tier = BufferedMergeSink(
        spark, base + "/buffered", key_col="key", ver_col="ver", merge_every=3
    )

    batches = [
        cdc.where((F.col("ver") % 4) == i) for i in range(4)
    ]
    # out-of-order + replayed delivery
    schedule = [batches[2], batches[0], batches[0], batches[3], batches[1], batches[3], batches[1]]
    for b in schedule:
        single.merge(b)
        two_tier.merge(b)

    got = sorted(
        (r.key, r.ver, r.value) for r in two_tier.state().select("key", "ver", "value").collect()
    )
    want = sorted(
        (r.key, r.ver, r.value) for r in single.state().select("key", "ver", "value").collect()
    )
    assert got == want
    # 7 batches, threshold 3 -> 2 threshold merges + 1 flush-on-read;
    # the single-tier sink paid the O(state) rewrite 7 times.
    assert two_tier.merges_done == 3
