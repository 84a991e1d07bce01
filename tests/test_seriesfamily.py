"""Series-family storage layer: the programmatic write/fetch path
(reference: client/m3dbseriesfamily.go Write/Fetch + merge iterator)."""

import pytest
from pyspark.sql import functions as F

from boostdb_spark.sources import SeriesFamily
from tests.conftest import SF_DIR


@pytest.fixture
def family(spark, tmp_path):
    return SeriesFamily(spark, "bTestDomain", "bTestSF", str(tmp_path))


def test_session_series_family_handle(spark, tmp_path):
    """BoostSession.series_family: the NewM3DBSeriesFamily analog —
    session-rooted handle that writes and fetches."""
    from boostdb_spark.session import BoostSession

    bs = BoostSession(spark, storage_root=str(tmp_path))
    fam = bs.series_family("bTestDomain", "bTestSF")
    fam.write(_fixture_df(spark))
    assert fam.fetch("cpu_utilization").count() == 10
    assert fam.qualified_name == "bTestDomain.bTestSF"


def _fixture_df(spark):
    # the reference e2e fixture: 10 points of cpu_utilization with tags
    # dc/env and per-point host attribute (executor_test.go:127-177)
    rows = [
        (
            "cpu_utilization",
            1_704_067_200_000_000_000 + i * 1_000_000_000,
            float(i + 1),
            "dc1",
            "test",
            f"host-{i:07d}",
        )
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "series string, ts long, value double, dc string, env string, host string"
    )


def test_write_fetch_roundtrip(spark, family):
    family.write(_fixture_df(spark))
    out = family.fetch("cpu_utilization").collect()
    assert len(out) == 10
    # ordered by ts within series (merge-iterator contract,
    # boostseriesiterator.go:301-343)
    ts = [r.ts for r in out]
    assert ts == sorted(ts)
    assert [r.value for r in out] == [float(i + 1) for i in range(10)]
    assert out[0].host == "host-0000000"


def test_fetch_time_range_half_open(spark, family):
    family.write(_fixture_df(spark))
    t0 = 1_704_067_200_000_000_000
    out = family.fetch(
        "cpu_utilization", start=t0 + 2_000_000_000, end=t0 + 5_000_000_000
    ).collect()
    assert [r.value for r in out] == [3.0, 4.0, 5.0]  # [start, end) — i in [2,5)


def test_schema_evolution_on_append(spark, family):
    """Attributes appear on first write (symtable dynamic creation,
    core/symtable.go:288-321) -> mergeSchema on read."""
    family.write(_fixture_df(spark))
    extra = spark.createDataFrame(
        [("mem_utilization", 1_704_067_200_000_000_000, 42.0, "zone-a")],
        "series string, ts long, value double, zone string",
    )
    family.write(extra)
    df = family.read()
    assert "zone" in df.columns and "host" in df.columns
    assert df.count() == 11


def test_partitioned_layout_prunes(spark, family):
    """Date partitioning must actually prune: fetch of one day reads one
    partition directory."""
    df = _fixture_df(spark)
    # spread across two days
    df2 = df.withColumn(
        "ts",
        F.when(F.col("value") > 5.0, F.col("ts") + F.lit(86_400_000_000_000)).otherwise(
            F.col("ts")
        ),
    )
    family.write(df2)
    pruned = family.fetch(
        "cpu_utilization",
        start=1_704_067_200_000_000_000,
        end=1_704_067_200_000_000_000 + 86_400_000_000_000,
    )
    assert pruned.count() == 5


def test_compact_collapses_small_files(spark, tmp_path):
    """Streaming-style many-small-file ingest, then compaction: the
    targeted date collapses to one file per day, rows and their
    in-file (series, ts) clustering are preserved, and untouched date
    partitions keep their files."""
    import os

    from pyspark.sql import functions as F

    from boostdb_spark.sources.seriesfamily import SeriesFamily

    fam = SeriesFamily(spark, "test", "compactme", str(tmp_path / "fams"))
    src = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            F.col("event_type").alias("series"),
            "ts",
            "value",
        )
    )
    # simulate micro-batch ingest: 6 tiny appends
    for i in range(6):
        fam.write(src.filter(F.pmod(F.hash("ts"), F.lit(6)) == i), files_per_day=4)

    def files_per_date():
        root = fam.path
        out = {}
        for d in os.listdir(root):
            if d.startswith("ts_date="):
                out[d] = len(
                    [f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")]
                )
        return out

    before = files_per_date()
    assert before and max(before.values()) > 1
    target = sorted(before)[0].split("=", 1)[1]
    n_before = fam.read().count()

    fam.compact(files_per_day=1, dates=[target])

    after = files_per_date()
    assert after[f"ts_date={target}"] == 1
    for d, n in before.items():
        if d != f"ts_date={target}":
            assert after[d] == n  # untouched partitions not rewritten
    assert fam.read().count() == n_before
    # compacted rows keep (series, ts) order within the file
    import pandas as pd  # noqa: F401
    part = spark.read.parquet(fam.path + f"/ts_date={target}").toPandas()
    assert list(part.sort_values(["series", "ts"]).index) == list(part.index) or len(part) <= 1
