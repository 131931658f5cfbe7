from __future__ import annotations

import pytest

from airflow_etl_pyspark_inmet_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
INMET_GLOB = "/root/reference/pyspark-stack/spark-apps/data/input/*.csv"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def inmet_glob():
    return INMET_GLOB
