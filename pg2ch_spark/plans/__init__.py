"""Physical-plan inspection — the scale story, checkable.

Catalyst owns optimization (SURVEY §4.2); this package is how we hold
it accountable: utilities to read the executed physical plan and
assert the shapes that matter at 100 TB — pushdown reached the scan,
small sides broadcast, top-k never full-sorts, map-only pipelines
stayed shuffle-free. Used by tests/test_plans.py and available for
ad-hoc `explain` triage.
"""

from pg2ch_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    physical_plan,
    scan_columns,
    uses_take_ordered,
)
