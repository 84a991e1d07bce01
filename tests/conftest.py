import datetime
import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_EPOCH = datetime.datetime(1970, 1, 1)


def to_ns(v) -> int:
    """INT64 ns from whatever a collected ts value is — the fixture has
    shipped ts both as ns-long and as timestamp[us]."""
    if isinstance(v, int):
        return v
    if v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return (v - _EPOCH) // datetime.timedelta(microseconds=1) * 1000


def ts_as_timestamp(df, col: str = "ts"):
    """df with ``col`` as TimestampType regardless of the fixture's
    physical ts representation (ns-long or timestamp[us])."""
    from pyspark.sql import functions as F

    if dict(df.dtypes)[col] in ("bigint", "long"):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df.withColumn(col, F.col(col).cast("timestamp"))


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
