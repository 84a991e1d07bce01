"""Embedding similarity search: brute-force cosine top-k (the exact
baseline) and an LSH-bucketed approximate variant (the 100 TB path).
North-star extension beyond the reference (no vector surface there).

Dot products are pure array expressions (``zip_with`` + ``aggregate``)
— JVM-side, left-to-right accumulation, bit-reproducible by the DuckDB
oracle which uses the same element order. Embeddings are cast to
double before any arithmetic so float32 promotion rules can't diverge
between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from boostdb_spark.operators.dedup import _spread


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _with_norm(df: DataFrame, id_col: str, vec_col: str, id_as: str, v_as: str):
    """(id, v, nrm) with the norm hoisted to a per-row column BEFORE any
    pair join: norms crossing the join exchange are materialized, so a
    pair evaluates one dot instead of three (the per-pair
    dot/(sqrt(dot)*sqrt(dot)) form re-folded both norms for every
    pair). Also spreads a single-file input across cores — the streamed
    side of a broadcast nested-loop join otherwise runs one-core."""
    out = _spread(df).select(
        F.col(id_col).alias(id_as), _as_double(F.col(vec_col)).alias(v_as)
    )
    return out.withColumn(f"{v_as}_nrm", norm(F.col(v_as)))


def dot(a, b):
    """Left-fold dot product over aligned arrays (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k
    nearest corpus vectors (self-matches excluded), ties broken by
    corpus id. Returns (query_id, match_id, cos).

    Scale shape: the query side is broadcast (top-k search is almost
    always few-queries-vs-huge-corpus), the corpus streams through —
    one pass, no shuffle until the per-query top-k window on the
    (small) candidate set. For huge query sets, use lsh_ann_topk.
    """
    q = _with_norm(queries, id_col, vec_col, "query_id", "qv")
    c = _with_norm(corpus, id_col, vec_col, "match_id", "cv")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            (dot(F.col("qv"), F.col("cv"))
             / (F.col("qv_nrm") * F.col("cv_nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold, id_a < id_b — embedding
    near-duplicate detection. Exact all-pairs form (correctness
    baseline); at corpus scale use lsh_ann_topk's bucketing to
    restrict the candidate set first."""
    a = _with_norm(df, id_col, vec_col, "id_a", "va")
    b = _with_norm(df, id_col, vec_col, "id_b", "vb")
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb"))
             / (F.col("va_nrm") * F.col("vb_nrm"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _hyperplane(plane_idx: int, dim: int):
    """Deterministic pseudo-random hyperplane: component j of plane i is
    +1/-1 from bit 0 of md5(i:j). Seedless and reproducible — and
    computed in PYTHON at plan time, so the plane ships to executors as
    a literal array instead of dim md5 calls per plane per row."""
    import hashlib

    signs = [
        1.0 if int(hashlib.md5(f"{plane_idx}:{j}".encode()).hexdigest()[:8], 16) % 2
        else -1.0
        for j in range(dim)
    ]
    return F.array(*[F.lit(s) for s in signs])


def lsh_bucket(vec_col, num_planes: int, dim: int):
    """Random-hyperplane (sign) LSH bucket id: bit i = sign(v . plane_i).
    Cosine-similar vectors collide with probability 1 - theta/pi per
    bit."""
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        bit = F.when(dot(vec_col, _hyperplane(i, dim)) >= 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return bucket


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN top-k: bucket both sides by sign-LSH, join on the
    bucket, rank within candidates. The scale path — the cross product
    collapses to an equi-join on bucket (expected corpus/2^planes
    candidates per query). Recall < 1 by construction; raise recall
    with multi-probe or fewer planes.

    Returns (query_id, match_id, cos) with <= k rows per query.
    """
    q = _with_norm(queries, id_col, vec_col, "query_id", "qv").withColumn(
        "bucket", lsh_bucket(F.col("qv"), num_planes, dim)
    )
    c = _with_norm(corpus, id_col, vec_col, "match_id", "cv").withColumn(
        "bucket", lsh_bucket(F.col("cv"), num_planes, dim)
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            (dot(F.col("qv"), F.col("cv"))
             / (F.col("qv_nrm") * F.col("cv_nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
