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


def test_media_binaryfile_roundtrip(spark, tmp_path):
    """write_media_files -> read_media_dir round trip: ids recovered
    from names, payload bytes exact, glob filters at listing time."""
    from boostdb_spark.sources.media import read_media_dir, write_media_files

    rows = [(7, b"\x89PNGfake7"), (42, b"\x89PNGfake42"), (9, b"not-png")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    write_media_files(df, str(tmp_path / "m"), ext="png")
    # also drop a file the glob must skip
    (tmp_path / "m" / "stray.txt").write_bytes(b"zzz")

    out = {
        r["doc_id"]: bytes(r["payload"])
        for r in read_media_dir(spark, str(tmp_path / "m"), glob="*.png").collect()
    }
    assert out == {7: b"\x89PNGfake7", 42: b"\x89PNGfake42", 9: b"not-png"}
