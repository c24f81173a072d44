from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The differential suite runs at the driver's t2 scale by default;
# override to sweep another scale factor (caught a real 4dp rounding
# tie at sf0.1 that sf0.01 never hits):
#   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 pytest tests/test_correctness.py
SF_T2 = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pg2ch_spark.session import get_spark

    spark = get_spark("pg2ch-tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    from tests.oracle import duck_con

    con = duck_con(SF_T2)
    yield con
    con.close()
