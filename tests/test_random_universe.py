"""A second full differential universe: every registered key vs its
oracle on a FRESH seeded random fixture set.

The sf fixtures are one draw from one generator; an operator (or its
oracle SQL) can silently overfit to that draw — a value grid, a key
range, a density. This module regenerates ALL ten tables with the same
schemas/domains but a different seed and different shapes (smaller,
denser dups, different key offsets) and runs the ENTIRE registry
differentially against DuckDB on it. A pass here means the engine and
its oracles agree as a matter of SEMANTICS, not of one dataset.

Domains mirror TESTDATA.md's generator (inspected from sf0.01): same
categorical vocabularies, 2dp money grids, date ranges, TIMESTAMP(us)
parquet units (pandas' default ns unit turns into raw longs under the
session's nanosAsLong and silently breaks every date predicate — found
by this suite's first run), srcN/lang document structure — because several
operators' declared contracts reference them (mix-weighting bands,
benchmark source src0, brand/type/size constants).
"""

from __future__ import annotations

import json
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pg2ch_spark import registry
from tests.oracle import compare_frames

registry.load_all()

SEED = 20260814

_N = {
    "region": 5,
    "nation": 25,
    "customer": 150,
    "supplier": 40,
    "part": 300,
    "orders": 1200,
    "lineitem": 4800,
    "events": 2000,
    "documents": 120,
    "embeddings": 120,
}

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_TYPES = ["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"]
_ADJ = ["small", "red", "blue", "hot", "old", "big", "new", "dark"]
_NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "clip", "cog"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_STATUS = ["P", "O", "F"]
_EVENTS = ["click", "view", "purchase", "signup", "error"]
_LANGS = ["en", "fr", "de", "es", "zh"]
_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a the "
    "line sort window order data column join small customer query big stream "
    "group filter"
).split()


def _c2(rng, lo, hi, n):
    """2dp money grid — the rounding-safety contract of the fixtures."""
    return np.round(rng.uniform(lo, hi, n), 2)


def generate_universe(out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    def w(name, df, **kw):
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), **kw)

    w("region", pd.DataFrame({"r_regionkey": range(5), "r_name": _REGIONS}))
    n_nat = _N["nation"]
    w(
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": range(n_nat),
                "n_name": [f"NATION_{i}" for i in range(n_nat)],
                "n_regionkey": (np.arange(n_nat) * 7 + 3) % 5,
            }
        ),
    )
    n = _N["supplier"]
    w(
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": range(n),
                "s_name": [f"Supplier#{i:09d}" for i in range(n)],
                "s_nationkey": rng.integers(0, n_nat, n).astype("int32"),
                "s_acctbal": _c2(rng, -900, 9900, n),
            }
        ),
    )
    n = _N["customer"]
    w(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(n),
                "c_name": [f"Customer#{i:09d}" for i in range(n)],
                "c_nationkey": rng.integers(0, n_nat, n).astype("int32"),
                "c_acctbal": _c2(rng, -999, 9999, n),
                "c_mktsegment": rng.choice(_SEGMENTS, n),
            }
        ),
    )
    n = _N["part"]
    w(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(n),
                "p_name": [
                    f"{rng.choice(_ADJ)} {rng.choice(_NOUN)}" for _ in range(n)
                ],
                "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n)],
                "p_type": rng.choice(_TYPES, n),
                "p_size": rng.integers(1, 51, n).astype("int32"),
                "p_retailprice": _c2(rng, 900, 1000, n),
            }
        ),
    )
    n = _N["orders"]
    odate = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2400, n), unit="D"
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": rng.integers(0, _N["customer"], n),
            "o_orderstatus": rng.choice(_STATUS, n),
            "o_totalprice": _c2(rng, 1000, 400000, n),
            "o_orderdate": odate,
            "o_orderpriority": rng.choice(_PRIORITIES, n),
        }
    )
    w("orders", orders, coerce_timestamps="us")
    n = _N["lineitem"]
    okeys = rng.integers(0, _N["orders"], n)
    ship_lag = rng.integers(1, 121, n)
    w(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": okeys,
                "l_partkey": rng.integers(0, _N["part"], n),
                "l_suppkey": rng.integers(0, _N["supplier"], n),
                "l_linenumber": (np.arange(n) % 7 + 1).astype("int32"),
                "l_quantity": rng.integers(1, 51, n).astype("float"),
                "l_extendedprice": _c2(rng, 1000, 70000, n),
                "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
                "l_returnflag": rng.choice(["A", "N", "R"], n),
                "l_linestatus": rng.choice(["F", "O"], n),
                "l_shipdate": orders.o_orderdate.values[okeys]
                + pd.to_timedelta(ship_lag, unit="D"),
            }
        ),
        coerce_timestamps="us",
    )
    n = _N["events"]
    ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 21 * 86400 * 10**6, n)), unit="us"
    )
    w(
        "events",
        pd.DataFrame(
            {
                "event_id": range(1, n + 1),
                "ts": ts,
                "user_id": rng.integers(0, 60, n),
                "event_type": rng.choice(_EVENTS, n, p=[0.3, 0.3, 0.15, 0.1, 0.15]),
                "value": _c2(rng, 0, 100, n),
                "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)],
            }
        ),
        coerce_timestamps="us",  # fixture events are TIMESTAMP(us) too
    )
    n = _N["documents"]
    texts = []
    for i in range(n):
        ln = int(rng.integers(10, 100))
        toks = list(rng.choice(_VOCAB, ln))
        if i % 9 == 0 and ln > 6:  # degenerate repetition
            toks = toks[:3] * (ln // 3)
        texts.append(" ".join(toks))
    for a, b in [(5, 3), (17, 3), (40, 22)]:  # exact-dup clusters
        texts[a] = texts[b]
    texts[50] = texts[48] + " key"  # near-dup
    w(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(1, n + 1),
                "text": texts,
                "lang": [_LANGS[i % 5] for i in range(n)],
                "source": [f"src{i % 20}" for i in range(n)],
                "n_chars": [len(t) for t in texts],
            }
        ),
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = _N["embeddings"]
    base = rng.normal(0, 1, (n, 64)).astype("float32")
    base[11] = base[3]  # exact dup vector
    base[23] = base[3] + rng.normal(0, 0.01, 64).astype("float32")  # near dup
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in base], pa.list_(pa.float32())
                ),
                "label": pa.array([int(i % 10) for i in range(n)], pa.int32()),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )


@pytest.fixture(scope="module")
def universe_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("random_universe"))
    generate_universe(d)
    return d


@pytest.fixture(scope="module")
def universe_duck(universe_dir):
    con = duckdb.connect()
    for t in _N:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{universe_dir}/{t}.parquet')"
        )
    yield con
    con.close()


ALL_KEYS = sorted(registry.QUERIES)


@pytest.mark.parametrize("key", ALL_KEYS)
def test_universe_query_vs_oracle(key, spark, universe_dir, universe_duck):
    df = registry.QUERIES[key](spark, universe_dir)
    sql = registry.ORACLES.get(key)
    if sql is None:
        assert df.count() >= 0
        return
    r = compare_frames(
        key, df.toPandas(), universe_duck.execute(sql).df()
    )
    assert r.ok, str(r)
