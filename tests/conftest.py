from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tslib_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tslib_spark-tests", master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
