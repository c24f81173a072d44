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
    """The first 50 keys queries() yields must be exactly the round-5
    backlog window (_ROUND5_PRIORITY): the keys with no CORRECTNESS row
    after rounds 1/3/4. Newly registered operators append after the
    priority list and must never displace it."""
    keys = list(registry.queries())
    prio = list(dict.fromkeys(registry._DRIVER_PRIORITY))
    assert keys[: len(prio)] == prio
    window = keys[:50]
    assert window == list(registry._ROUND5_PRIORITY)
    # every window key carries an exact oracle except the declared
    # rows-only sketch (HLL binary registers differ across engines)
    oracles = registry.oracle_sql()
    assert [k for k in window if k not in oracles] == ["agg_hll_sketch_merge"]
    # oracle_sql() iterates in the same order as queries()
    prio_with_oracle = [k for k in prio if k in oracles]
    assert list(oracles)[: len(prio_with_oracle)] == prio_with_oracle


def test_round5_and_6_priorities_cover_all_unchecked_keys():
    """Driver-window plan audit: EVERY key lacking a CORRECTNESS row
    after rounds 1/3/4 must fall inside the ACTIVE round-5 window (the
    first 50 keys of queries()) or the PLANNED round-6 window (prepend
    _ROUND6_PRIORITY). Round 3's verdict was precisely about this
    invariant silently breaking."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for art in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
    ):
        with open(os.path.join(here, art)) as f:
            checked |= set(json.load(f))
    all_keys = list(registry.queries())
    r5 = set(all_keys[:50])

    def window(priorities):
        sim = []
        for k in priorities + all_keys:
            if k not in sim:
                sim.append(k)
        return set(sim[:50])

    r6 = window(list(registry._ROUND6_PRIORITY) + list(registry._DRIVER_PRIORITY))
    missed = [k for k in all_keys if k not in checked and k not in (r5 | r6)]
    assert missed == [], f"never-checked keys outside both planned windows: {missed}"
    # the round-5 window itself must stay fully packed with unchecked
    # keys (a re-check in round 5 while unchecked keys wait would be
    # the round-3 failure shape again)
    assert len(registry._ROUND5_PRIORITY) == 50
    assert not (r5 & checked), f"already-checked keys occupy the round-5 window: {sorted(r5 & checked)}"
