import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from boostdb_spark.session import get_spark

    s = get_spark(app_name="boostdb-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    from boostdb_spark.verify import duckdb_con

    con = duckdb_con(SF_DIR)
    yield con
    con.close()
