from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from clickhouse_table_copier_spark.session import get_spark

    s = get_spark(
        app_name="ctc-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "10MB"},
    )
    yield s
    s.stop()
