"""Parquet bloom-filter layout (sources/bloom.py): the filter is
actually written for high-cardinality columns, skipped when dictionary
encoding subsumes it, and probe results stay exact."""

import glob
import os

from pyspark.sql import functions as F

from boostdb_spark.sources.bloom import bloom_write, read_bloom
from tests.conftest import SF_DIR


def _dir_bytes(p):
    return sum(os.path.getsize(f) for f in glob.glob(p + "/*.parquet"))


def test_bloom_written_for_high_cardinality_column(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with_p, without_p = str(tmp_path / "with"), str(tmp_path / "without")
    bloom_write(ev, with_p, cols=["event_id"], expected_ndv=10_000, num_files=2)
    ev.repartition(2).write.mode("overwrite").parquet(without_p)
    # the filter occupies real bytes next to the identical data pages
    assert _dir_bytes(with_p) > _dir_bytes(without_p)


def test_bloom_skipped_when_dictionary_covers_column(spark, tmp_path):
    """parquet-mr omits the bloom filter for fully dictionary-encoded
    columns (the dictionary already answers membership exactly) — the
    layout must not pay for redundant filters on low-NDV columns."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with_p, without_p = str(tmp_path / "w2"), str(tmp_path / "wo2")
    bloom_write(ev, with_p, cols=["event_type"], num_files=2)
    ev.repartition(2).write.mode("overwrite").parquet(without_p)
    assert _dir_bytes(with_p) == _dir_bytes(without_p)


def test_bloom_probe_results_exact(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = str(tmp_path / "b")
    bloom_write(ev, p, cols=["event_id"], expected_ndv=10_000, num_files=4)
    probe = [3, 77, 500, 10**9]  # incl. a guaranteed miss
    got = sorted(
        map(tuple, read_bloom(spark, p).filter(F.col("event_id").isin(probe))
            .select("event_id", "value").collect())
    )
    want = sorted(
        map(tuple, ev.filter(F.col("event_id").isin(probe))
            .select("event_id", "value").collect())
    )
    assert got == want and len(got) > 0
