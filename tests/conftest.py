from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from deg04_local_data_lake_spark.session import get_spark_session

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark_session(
        app_name="deg04-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        warehouse=tempfile.mkdtemp(prefix="deg04-wh-"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    from deg04_local_data_lake_spark.caching import release_all

    release_all()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def smoke_dir() -> str:
    return SF_SMOKE
