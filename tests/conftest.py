from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm_etl_cloud_run_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cpus=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
