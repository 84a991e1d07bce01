"""File-format connectors beyond Parquet.

The reference has exactly one storage backend — M3DB
(testdata/executordata/config.yaml:1-12; SURVEY.md section 2.1 marks
file formats / external connectors ABSENT). On Spark the reader/writer
matrix is built in; these helpers pin the engine's conventions
(header/schema handling, compression, the ns ``ts`` contract) so every
format round-trips a series-family DataFrame identically.

Scale notes: CSV/JSON are ingest/egress formats here — internal storage
is always columnar (Parquet default; ORC supported for ecosystems
standardized on it — stripe statistics and pushdown are equivalent).
CSV and JSON scans ARE splittable by byte-range (uncompressed), but
carry no row-group statistics or projection pushdown, so
conversion-on-ingest is the 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: formats supported for ingest/egress. parquet/orc are the columnar
#: pair (row-group/stripe statistics, dictionary encoding, projection
#: pushdown); csv/json are text ingest/egress only.
FORMATS = ("parquet", "orc", "csv", "json")

# Spark's default text-format timestamp pattern carries only millis;
# series data is µs-precision (ns-native upstream), so pin full-µs
# patterns for both zoned and NTZ columns on write AND read.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _ts_options(rw, *, read: bool = False):
    rw = (
        rw.option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_NTZ_FMT)
    )
    if read:
        # a pinned pattern alone would silently NULL externally-produced
        # timestamps that carry millis or no fraction (e.g.
        # '2024-01-01T00:00:00Z') in PERMISSIVE mode; the fallback keeps
        # Spark's lenient parser for non-matching values
        rw = rw.option("enableDateTimeParsingFallback", "true")
    return rw


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` in any supported format with engine conventions:
    CSV with header; schema either supplied (production: no inference
    pass over 100 TB) or inferred (exploration)."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("csv", "json"):
        reader = _ts_options(reader, read=True)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    return reader.format(fmt).load(path)


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write in any supported format; CSV gets a header, everything is
    compressed (zstd for parquet via session conf, gzip for text
    formats)."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    writer = df.write.mode(mode)
    if fmt in ("csv", "json"):
        writer = _ts_options(writer)
    if fmt == "csv":
        writer = writer.option("header", "true").option("compression", "gzip")
    elif fmt == "json":
        writer = writer.option("compression", "gzip")
    writer.format(fmt).save(path)
