"""BoostSession facade: catalog registration and the parameterized SQL
entry point (replaces the reference's placeholder-literal machinery,
query/base/literalintexpression.go:9-113)."""

from boostdb_spark.session import BoostSession
from tests.conftest import SF_DIR


def test_register_and_parameterized_sql(spark):
    bs = BoostSession(spark)
    bs.register_dir(SF_DIR)
    df = bs.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = :etype AND value < :vmax",
        etype="click",
        vmax=100.0,
    )
    [row] = df.collect()
    want = (
        bs.table("events")
        .filter("event_type = 'click' AND value < 100.0")
        .count()
    )
    assert row["n"] == want > 0


def test_register_parquet_single(spark, tmp_path):
    bs = BoostSession(spark)
    src = spark.range(5).toDF("k")
    p = str(tmp_path / "t")
    src.write.parquet(p)
    bs.register_parquet("tiny", p)
    assert bs.sql("SELECT count(*) AS n FROM tiny").collect()[0]["n"] == 5


def test_ts_helpers_zone_independent(spark):
    """ts_ns / ts_lit on TIMESTAMP_NTZ must not shift with the session
    time zone (ADVICE r1: a cast to TIMESTAMP applies the zone)."""
    from boostdb_spark.functions.scalar import ts_lit, ts_ns

    df = spark.sql("SELECT TIMESTAMP_NTZ'2024-01-01 00:00:00' AS ts")
    expect_ns = 1_704_067_200 * 10**9
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            ns = df.select(ts_ns(df, "ts").alias("ns")).collect()[0]["ns"]
            hit = df.filter(df.ts == ts_lit(df, expect_ns)).count()
            results[tz] = (ns, hit)
        assert all(v == (expect_ns, 1) for v in results.values()), results
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
