from __future__ import annotations

import os

import pytest

SMOKE_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
ORACLE_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from mapreduce_4_spark.session import get_spark

    spark = get_spark("mapreduce_4_spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SMOKE_DIR


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return ORACLE_DIR
