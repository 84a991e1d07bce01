"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's e2e test query
re-expressed through the dialect front) at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full coverage suite from
``boostdb_spark.suite`` (one entry per operator family in SURVEY.md
section 2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from boostdb_spark import suite  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def _ensure_conf(spark: SparkSession) -> SparkSession:
    """The events fixture is TIMESTAMP(NANOS) parquet; the driver's
    session may not carry our reader configs, so set the ones that are
    runtime-settable."""
    for k, v in [
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        # broadcast posture (see boostdb_spark/session.py): static
        # estimate-based broadcasts off — estimates don't grow through
        # explode; AQE re-converts at runtime from actual sizes
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_conf(spark)
    return suite.spark_queries()["flagship_series_scan"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_ensure_conf(spark), sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in suite.spark_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get the
    driver's weaker rows-only check)."""
    return suite.oracle_queries()
