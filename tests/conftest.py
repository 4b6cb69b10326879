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


def round_half_away(x):
    """Half-AWAY-from-zero rounding — the rule BOTH engines use for the
    1e-6 quantization (Spark HALF_UP == DuckDB round). np.round is
    banker's (half-even) and diverges on exact .5 boundaries, which
    float32 values CAN hit after *1e6 (e.g. 1/128 -> 7812.5)."""
    import numpy as np

    return np.trunc(x + np.copysign(0.5, x))
