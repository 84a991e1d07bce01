"""CSV/JSON connector round-trips: every format must reproduce the
events series-family rows exactly (the ns `ts` long survives because
CSV/JSON serialize it as an integer, not a timestamp)."""

import pytest
from pyspark.sql import functions as F

from boostdb_spark.sources.files import read_any, write_any
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, tmp_path, fmt):
    src = spark.read.parquet(EVENTS).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = str(tmp_path / f"events_{fmt}")
    write_any(src, path, fmt)
    back = read_any(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_csv_infer_reads_rows(spark, tmp_path):
    src = spark.read.parquet(EVENTS).select("event_id", "event_type", "value")
    path = str(tmp_path / "events_csv")
    write_any(src, path, "csv")
    back = read_any(spark, path, "csv")
    assert back.count() == src.count()
    assert back.filter(F.col("value").isNotNull()).count() == src.count()
