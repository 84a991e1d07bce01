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
