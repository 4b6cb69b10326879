from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mr-spark-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from mr_spark.oracle import duck_connection

    return duck_connection(SF_DIR)
