"""Z-order clustering: every participating column's row-group stats are
narrow (multi-dim data skipping), vs a single-column sort where the other
dimension's stats span the whole domain."""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from boostdb_spark.sources.zorder import zorder_code, zorder_write

N = 60_000
DOM = 1000  # x and y are deterministic pseudo-uniform in [0, DOM)
FILES = 16


def _grid(spark):
    return spark.range(N).select(
        F.col("id"),
        F.pmod(F.col("id") * 2654435761, F.lit(DOM)).alias("x"),
        F.pmod(F.col("id") * 40503 + 17, F.lit(DOM)).alias("y"),
    )


def _mean_spans(path, cols):
    """Mean per-row-group (max-min)/domain for each column, across files."""
    spans = {c: [] for c in cols}
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in cols:
                st = g.column(names.index(c)).statistics
                spans[c].append((st.max - st.min) / (DOM - 1))
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_clusters_every_dimension(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xsort")
    zorder_write(df, zpath, ["x", "y"], num_files=FILES)
    (
        df.repartitionByRange(FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    z = _mean_spans(zpath, ["x", "y"])
    xs = _mean_spans(xpath, ["x", "y"])
    # 16 files over 2 dims: z-order covers ~16^(-1/2) = 1/4 of each domain
    # per file; a single-column sort leaves the other dim at ~full span.
    assert z["x"] < 0.40 and z["y"] < 0.40, z
    assert xs["y"] > 0.80, xs
    assert xs["x"] < z["x"]  # 1-D sort is still tighter on its own column

    # Layout must not change content.
    back = spark.read.parquet(zpath)
    assert back.count() == N
    assert (
        back.agg(F.sum("x"), F.sum("y")).first()
        == df.agg(F.sum("x"), F.sum("y")).first()
    )


def test_zorder_code_bounds_and_nulls(spark):
    df = spark.createDataFrame(
        [(0.0, None), (5.0, 1.0), (10.0, 2.0)], "a double, b double"
    )
    out = df.select(zorder_code(df, ["a", "b"], bits=4).alias("z")).collect()
    zs = [r.z for r in out]
    assert all(0 <= z < 1 << 8 for z in zs)
    assert zs == sorted(zs)  # monotone along the (a,b) diagonal here

    # Explicit bounds clamp outliers instead of widening every bucket.
    clamped = df.select(
        zorder_code(df, ["a"], bits=4, bounds={"a": (0.0, 5.0)}).alias("z")
    ).collect()
    assert clamped[-1].z == (1 << 4) - 1
