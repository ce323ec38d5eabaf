from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_dbt_finance_warehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    yield s
    s.stop()
