"""Local replica of the driver's correctness gate: run each suite query
on Spark AND its DuckDB oracle, compare order-insensitively.

Used by tests (sf0.001) so every suite entry is verified before the
driver ever sees it. Comparison: columns sorted by name, rows sorted by
all columns, exact equality (the suite is designed for bit-deterministic
results — see suite.py docstring).

REPRESENTATION-STRICT: the driver hashes the raw cell values, so a
Spark ``Decimal('16492.000000')`` against a DuckDB ``float64 16492.0``
is a MISMATCH here even though the numbers are equal — round 1 lost 10
driver queries to exactly that, masked by a Decimal->float conversion
this module used to do. Queries must cast final DECIMAL accumulators
back to DOUBLE on both sides before output.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from boostdb_spark.session import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    # NaN -> None only (both engines ship NULL aggregates differently
    # through pandas). Decimal is deliberately NOT converted: the driver
    # hashes representations, so Decimal-vs-float must fail here too.
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _is_int(v) -> bool:
    """True for Python/NumPy integer scalars, excluding bool (bool is a
    subclass of int but both engines ship booleans as booleans).
    np.integer covers object-dtype cells that .tolist() leaves as numpy
    scalars."""
    return isinstance(v, (int, np.integer)) and not isinstance(v, bool)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_norm_cell)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"column mismatch: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count mismatch: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        av = [_norm_cell(v) for v in a[c].tolist()]
        bv = [_norm_cell(v) for v in b[c].tolist()]
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if x is None or y is None:
                problems.append(f"{c}[{i}]: {x!r} != {y!r}")
            elif isinstance(x, Decimal) != isinstance(y, Decimal):
                problems.append(
                    f"{c}[{i}]: representation mismatch "
                    f"{type(x).__name__}({x!r}) vs {type(y).__name__}({y!r})"
                    " — cast the final DECIMAL to DOUBLE on both sides"
                )
            elif _is_int(x) != _is_int(y) and (
                (_is_int(x) or isinstance(x, float))
                and (_is_int(y) or isinstance(y, float))
            ):
                # int-vs-float twin: the driver hashes representations,
                # so BIGINT 3 vs DOUBLE 3.0 is a driver FAIL even though
                # pandas equality passes (round-9 lesson:
                # dialect_recursive_cte shipped red on exactly this).
                # A twin with UNEQUAL values (int 3 vs float 4.0) is a
                # real value bug — say so, or the fixer chases dtypes.
                if x == y:
                    problems.append(
                        f"{c}[{i}]: representation mismatch "
                        f"{type(x).__name__}({x!r}) vs {type(y).__name__}({y!r})"
                        " — align the output dtype (cast to BIGINT or DOUBLE"
                        " on BOTH sides)"
                    )
                else:
                    problems.append(
                        f"{c}[{i}]: {x!r} != {y!r} (value mismatch; dtypes"
                        f" also differ: {type(x).__name__} vs"
                        f" {type(y).__name__})"
                    )
            elif x != y:
                problems.append(f"{c}[{i}]: {x!r} != {y!r}")
            if len(problems) > 5:
                return problems
    return problems


def run_one(spark, con, name: str, sf_dir: str) -> list[str]:
    from boostdb_spark import suite

    fn = suite.spark_queries()[name]
    sql = suite.oracle_queries().get(name)
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    odf = con.sql(sql).df()
    return compare(sdf, odf)
