"""Edge-input regression tests: short documents and crash recovery.

The sf fixtures contain no document shorter than ~100 chars, so the
short-doc failure modes (Spark's ``sequence(1, n)`` DESCENDS when
n < 1, emitting spurious positions where DuckDB's ``range(1, n)``
emits none — crashing ``slice`` at start=0 in the worst case) never
fire in the differential suite. These tests run the affected queries
on a synthetic corpus that is mostly short/degenerate docs and diff
against the same DuckDB oracle on the same parquet.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from pg2ch_spark import registry
from tests.oracle import compare_frames

SHORT_DOCS = pd.DataFrame(
    {
        "doc_id": list(range(1, 13)),
        "text": [
            "",  # empty
            "a",  # single char (lang-id bigram edge)
            "ab",  # exactly one bigram
            "abcdefg",  # 7 chars: below shingle k=8
            "abcdefgh",  # exactly k: one shingle, no complete window
            "abcdefghij",  # k+w-2 = 10: still no complete window
            "abcdefghijk",  # k+w-1 = 11: exactly one window
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "x y",
            "hello world hello world hello world",
            "zzzzzzzzzzzzzzzzzzzzzzzz",
        ],
        "lang": ["en", "en", "de", "fr", "en", "de", "fr", "en", "en", "de", "fr", "en"],
        "source": ["edge"] * 12,
        "n_chars": [0, 1, 2, 7, 8, 10, 11, 44, 40, 3, 35, 24],
    }
)


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    SHORT_DOCS.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("key", ["text_fingerprint", "text_lang_id", "text_quality_score"])
def test_short_docs_match_oracle(spark, edge_sf_dir, edge_duck, key):
    qs, oracles = registry.queries(), registry.oracle_sql()
    spark_pdf = qs[key](spark, edge_sf_dir).toPandas()
    oracle_pdf = edge_duck.execute(oracles[key]).df()
    r = compare_frames(key, spark_pdf, oracle_pdf)
    assert r.ok, str(r)


def test_merge_sink_recovers_from_interrupted_commit(spark, tmp_path):
    """Crash between _commit's two renames leaves only '.old'; state()
    must recover it (checkpointed offsets have already advanced, so a
    lost state dir would silently drop acked batches)."""
    from pg2ch_spark.cdc.merge_sink import ReplacingMergeSink

    path = str(tmp_path / "state")
    sink = ReplacingMergeSink(spark, path, key_col="k", ver_col="v")
    b1 = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k int, v int, val string")
    sink.merge(b1)

    # Simulate the crash point: current renamed away, staging never promoted.
    os.rename(path, path + ".old")
    assert not os.path.exists(path)

    recovered = sink.state()
    assert recovered is not None
    assert sorted(r.k for r in recovered.collect()) == [1, 2]
    assert os.path.exists(path)  # recovery promoted .old back

    # And the sink keeps working after recovery.
    b2 = spark.createDataFrame([(1, 30, "c")], "k int, v int, val string")
    sink.merge(b2)
    final = {r.k: r.val for r in sink.state().collect()}
    assert final == {1: "c", 2: "b"}
