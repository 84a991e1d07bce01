"""Raw-media file connector: a directory of image/audio blobs as a
Spark source via the built-in ``binaryFile`` format.

The reference has no media or file surface at all (SURVEY.md §2.1
marks external connectors ABSENT) — this is north-star scope: the
ingestion mouth of a multimodal curation pipeline. ``binaryFile``
gives (path, modificationTime, length, content) with the payload
column prunable and ``pathGlobFilter`` pushdown, so a metadata-only
query never reads the blob bytes.

Scale: one file per blob is the pathological layout at 100 TB (driver
file-listing, task-per-file). The connector is the INGEST step; the
write side of the suite's pipeline immediately re-materializes blobs
into Parquet binary columns (big row groups, scan-speed reads) — the
documented posture, same as CSV/JSON conversion-on-ingest in
sources/files.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_media_files(
    df: DataFrame,
    path: str,
    ext: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> None:
    """Distributed media-file sink: each task writes its partition's
    rows as ``<id>.<ext>`` files under ``path`` (local/shared FS). One
    file per blob — the layout object stores and media dumps arrive
    in. Deterministic file names, so re-writes are idempotent."""

    def dump(rows) -> None:
        # create the dir in the TASK, not the driver: on a multi-node
        # cluster the executor's filesystem is the one that matters
        os.makedirs(path, exist_ok=True)
        for r in rows:
            with open(os.path.join(path, f"{r[id_col]}.{ext}"), "wb") as f:
                f.write(bytes(r[payload_col]))

    df.select(id_col, payload_col).foreachPartition(dump)


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    id_from_name: bool = True,
) -> DataFrame:
    """Read a media directory through the binaryFile source ->
    (doc_id, payload, n_bytes). ``glob`` filters at the file-listing
    level (``pathGlobFilter`` — skipped files are never opened);
    ``id_from_name`` recovers the numeric id from ``<id>.<ext>``
    basenames."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    cols = [
        F.col("content").alias("payload"),
        F.col("length").cast("long").alias("n_bytes"),
    ]
    if id_from_name:
        doc_id = F.regexp_extract(
            F.element_at(F.split(F.col("path"), "/"), -1), r"^(\d+)\.", 1
        ).cast("long")
        cols.insert(0, doc_id.alias("doc_id"))
    else:
        cols.insert(0, F.col("path"))
    return df.select(*cols)
