from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkbigdatatextanalysis_spark.session import get_spark

REFERENCE_RES = "/root/reference/src/main/resources"
TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def reference_resources() -> str:
    if not os.path.isdir(REFERENCE_RES):
        pytest.skip("reference fixture CSVs not available")
    return REFERENCE_RES


def sf_dir(sf: str) -> str:
    d = os.path.join(TESTDATA, f"sf{sf}")
    if not os.path.isdir(d):
        pytest.skip(f"testdata {d} not available")
    return d
