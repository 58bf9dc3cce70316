import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from yupana_spark.session import get_spark

    s = get_spark("yupana-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def tsdb(spark):
    from yupana_spark import Tsdb, default_schema

    return Tsdb(spark, default_schema(), SF_SMALL)
