"""Bucketed co-located joins: correctness vs a plain join AND the scale
property itself — no shuffle Exchange in the physical plan (the whole
point of pre-bucketing at 100 TB)."""

import pyspark.sql.functions as F

import tests.conftest as cfg
from boostdb_spark.session import load_tables
from boostdb_spark.sources.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_is_shuffle_free_and_correct(spark, tmp_path):
    t = load_tables(spark, cfg.SF_DIR)
    ev = t["events"].select("event_id", "user_id", "value")
    cust = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_acctbal"
    )

    write_bucketed(
        ev, "ev_b", ["user_id"], 8, sort_cols=["user_id"],
        path=str(tmp_path / "ev_b"),
    )
    write_bucketed(
        cust, "cust_b", ["user_id"], 8, sort_cols=["user_id"],
        path=str(tmp_path / "cust_b"),
    )
    try:
        joined = bucketed_join(spark, "ev_b", "cust_b", ["user_id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        got = joined.groupBy().agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        ).collect()[0]
        want = ev.join(cust, "user_id").groupBy().agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        ).collect()[0]
        assert (got["n"], got["sv"]) == (want["n"], want["sv"]) and got["n"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_bucketed_aggregation_no_exchange(spark, tmp_path):
    """groupBy on the bucket key also skips the shuffle — partial and
    final aggregation collapse into one stage per bucket."""
    t = load_tables(spark, cfg.SF_DIR)
    ev = t["events"].select("event_id", "user_id", "value")
    write_bucketed(
        ev, "ev_b2", ["user_id"], 8, sort_cols=["user_id"],
        path=str(tmp_path / "ev_b2"),
    )
    try:
        agg = spark.table("ev_b2").groupBy("user_id").agg(
            F.count("*").alias("n")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
        assert agg.count() == ev.select("user_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_b2")
