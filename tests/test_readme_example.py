"""The README 'Use' example must keep working verbatim — doc rot on the
front-door API is a user-facing break."""

from tests.conftest import SF_DIR


def test_readme_use_example(spark):
    from boostdb_spark.session import BoostSession

    bs = BoostSession(spark)
    bs.register_dir(SF_DIR)
    out = bs.sql("SELECT event_type, count(*) AS n FROM events GROUP BY 1")
    assert out.count() > 0

    from boostdb_spark.plans import sugar

    df = sugar.query(
        bs.spark,
        "SELECT s.user_id, s FROM mydomain.cpu s WHERE s < 100.0",
        sugar.SeriesFamilyBinding(
            view="events", series_col="event_type", value_col="value", ts_col="ts"
        ),
        start=1704412800 * 10**9,
        end=1705708800 * 10**9,
    )
    assert df.count() >= 0  # 'cpu' series absent in fixture: empty but valid

    # parameterized ANSI path
    got = bs.sql(
        "SELECT count(*) AS n FROM events WHERE value < :thr", thr=50.0
    ).collect()[0]["n"]
    assert got > 0

    # placeholder + SELECT * through the dialect
    star = sugar.query(
        bs.spark,
        "SELECT * FROM boost.events WHERE click < :thr",
        sugar.SeriesFamilyBinding(
            view="events", series_col="event_type", value_col="value", ts_col="ts"
        ),
        params={"thr": 30.0},
    )
    assert set(star.columns) == set(bs.table("events").columns)
