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


def test_driver_window_order_derives_from_evidence_age():
    """The registry order is the ROTATION (VERDICT r6 item 4): keys
    with no committed CORRECTNESS row lead (new operators earn driver
    evidence the round they are written), then keys by oldest
    most-recent evidence — so a regression in any key is re-checked
    within bounded staleness instead of waiting on a hand-rotated
    tuple."""
    keys = list(registry.queries())
    ev = registry.evidence_rounds()
    ages = [ev.get(k, -1) for k in keys]
    assert ages == sorted(ages), "queries() is not oldest-evidence-first"
    # never-checked keys (this round's additions) lead the window
    never = {k for k in keys if k not in ev}
    assert set(keys[: len(never)]) == never
    # oracle_sql() iterates in the same relative order
    oracles = registry.oracle_sql()
    with_oracle = [k for k in keys if k in oracles]
    assert list(oracles) == with_oracle


def test_rotation_bounds_staleness():
    """Round-robin property: simulating the driver (verify the first
    DRIVER_WINDOW keys, record evidence, re-sort) must re-check EVERY
    key within ceil(N / DRIVER_WINDOW) rounds — the staleness bound the
    rotation exists to guarantee."""
    import math

    keys = list(registry.queries())
    ev = dict(registry.evidence_rounds())
    n, w = len(keys), registry.DRIVER_WINDOW
    bound = math.ceil(n / w)
    pending = set(keys)
    rnd = max(ev.values(), default=0)
    for _ in range(bound):
        rnd += 1
        order = sorted(keys, key=lambda k: (ev.get(k, -1), k))
        for k in order[:w]:
            ev[k] = rnd
            pending.discard(k)
    assert pending == set(), f"keys staler than {bound} rounds: {sorted(pending)}"
