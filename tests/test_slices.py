"""Time-sliced execution: slices partition the span exactly (no row
lost or duplicated vs. the one-shot query) and the streaming
foreachBatch form drains to the same totals."""

import pyspark.sql.functions as F

from boostdb_spark.streaming import execute_sliced, foreach_slice, time_slices
from boostdb_spark.streaming.ingest import file_stream
from tests.conftest import SF_DIR, to_ns

EVENTS = f"{SF_DIR}/events.parquet"
NS = 1_000_000_000


def test_time_slices_partition_exactly(spark):
    df = spark.read.parquet(EVENTS)
    lo, hi = (to_ns(v) for v in df.agg(F.min("ts"), F.max("ts")).collect()[0])
    window = 7 * 86400 * NS  # 1-week slices
    counts = []
    spans = []
    for s, e, sdf in time_slices(df, lo, hi + 1, window):
        counts.append(sdf.count())
        spans.append((s, e))
    assert sum(counts) == df.count()
    # half-open contiguous spans covering [lo, hi]
    assert spans[0][0] == lo and spans[-1][1] == hi + 1
    assert all(spans[i][1] == spans[i + 1][0] for i in range(len(spans) - 1))
    assert len(spans) > 1  # fixture spans > one week


def test_execute_sliced_counts(spark):
    df = spark.read.parquet(EVENTS)
    lo, hi = (to_ns(v) for v in df.agg(F.min("ts"), F.max("ts")).collect()[0])
    seen = []
    n = execute_sliced(
        df, lo, hi + 1, 10 * 86400 * NS, lambda sdf, s, e: seen.append(sdf.count())
    )
    assert n == len(seen) and sum(seen) == df.count()


def test_foreach_slice_drains_stream(spark, tmp_path):
    landing = str(tmp_path / "landing")
    spark.read.parquet(EVENTS).repartition(3).write.parquet(landing)
    sdf = file_stream(spark, landing, max_files_per_trigger=1)
    totals = {"rows": 0, "batches": 0}

    def per_batch(bdf, batch_id):
        totals["rows"] += bdf.count()
        totals["batches"] += 1

    q = foreach_slice(sdf, per_batch, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert totals["rows"] == spark.read.parquet(landing).count()
    assert totals["batches"] >= 3  # one micro-batch per file


def test_export_pages_resumes_at_missing_page(spark, tmp_path):
    """Resumable export: a crashed run's completed pages are skipped on
    re-run; only missing pages are rewritten, and the reassembled
    pages equal the full range."""
    import os
    import shutil

    from boostdb_spark.streaming.slices import export_pages

    NS = 1_000_000_000
    df = spark.createDataFrame(
        [(i, i * 100 * NS, float(i)) for i in range(40)],
        "event_id long, ts long, value double",
    )
    base = str(tmp_path / "pages")
    total, written = export_pages(df, base, 0, 4000 * NS, 1000 * NS)
    assert (total, written) == (4, 4)
    # simulate a crash that lost one page
    shutil.rmtree(os.path.join(base, "slice_id=2"))
    total2, written2 = export_pages(df, base, 0, 4000 * NS, 1000 * NS)
    assert (total2, written2) == (4, 1)  # only the missing page rewrote
    back = spark.read.parquet(base)
    assert back.count() == 40
    assert back.select("slice_id").distinct().count() == 4
    # every row filed under the slice its ts maps to
    bad = back.filter(
        (F.col("ts") / (1000 * NS)).cast("long") != F.col("slice_id")
    ).count()
    assert bad == 0


def test_export_pages_rejects_disabled_success_markers(spark, tmp_path):
    """With _SUCCESS markers disabled no page ever looks complete, so
    every re-run would silently degrade to a full re-export — the
    misconfiguration is refused loudly instead."""
    import pytest

    from boostdb_spark.streaming.slices import export_pages

    NS = 1_000_000_000
    df = spark.createDataFrame(
        [(1, 0 * NS, 1.0)], "event_id long, ts long, value double"
    )
    hconf = spark._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    old = hconf.get(key, "true")
    hconf.set(key, "false")
    try:
        with pytest.raises(ValueError, match="_SUCCESS markers"):
            export_pages(df, str(tmp_path / "p"), 0, 1000 * NS, 1000 * NS)
    finally:
        hconf.set(key, old)
