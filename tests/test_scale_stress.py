"""Opt-in scale stress (BOOST_STRESS=1): run the heaviest operators on
inputs multiplied well past the fixture scale and assert they complete
with sane output — the local stand-in for the 100 TB posture checks
(no OOM, no cartesian blowup, shuffles bounded).

Excluded from the default run: the driver's per-round pytest should
stay fast. Run manually: BOOST_STRESS=1 python -m pytest
tests/test_scale_stress.py -q
"""

import os

import pytest
from pyspark.sql import functions as F

from boostdb_spark.operators import dedup as dd
from boostdb_spark.operators import timeseries as ts_ops
from tests.conftest import SF_DIR, ts_as_timestamp

pytestmark = pytest.mark.skipif(
    not os.environ.get("BOOST_STRESS"), reason="set BOOST_STRESS=1 to run"
)

SF01 = "/root/testdata/sf0.1"


def _events_x(spark, mult):
    """events replicated mult times with distinct event_ids and shifted
    user_ids (derived from driver fixtures, not synthesized)."""
    e = spark.read.parquet(f"{SF01}/events.parquet")
    n = e.count()
    return (
        e.crossJoin(F.broadcast(spark.range(mult).withColumnRenamed("id", "rep")))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * n)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 1000)
        .drop("rep")
    )


def test_asof_join_5m_rows(spark):
    e = _events_x(spark, 50)  # 5M rows
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = e.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = ts_ops.asof_join(left, right, on=["user_id"], ts_col="ts")
    n_left = left.count()
    assert out.count() == n_left  # left-join semantics: one row per left row


def test_session_windows_5m_rows(spark):
    from boostdb_spark.streaming.windows import session_agg

    e = ts_as_timestamp(_events_x(spark, 50)).withColumn(
        "ts_t", F.col("ts").cast("timestamp")
    )
    out = session_agg(e, "30 minutes", ["user_id"], [F.count("*").alias("n")],
                      ts_col="ts_t")
    agg = out.agg(F.sum("n"), F.count("*")).collect()[0]
    assert agg[0] == e.count()  # every row lands in exactly one session
    assert agg[1] > 0


def test_minhash_100k_docs(spark):
    d = spark.read.parquet(f"{SF01}/documents.parquet")
    n = d.count()
    docs = (
        d.crossJoin(F.broadcast(spark.range(20).withColumnRenamed("id", "rep")))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
        .drop("rep")
    )  # 100k docs incl. 20 exact copies of each -> plenty of true pairs
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.8, num_hashes=32, bands=16, n=3)
    # replicated copies are exact dups: jaccard 1.0 pairs must surface
    assert pairs.filter(F.col("jaccard") >= 0.999).limit(1).count() == 1
