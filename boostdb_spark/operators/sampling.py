"""Deterministic sampling and dataset splitting for training-data
pipelines. North-star extension beyond the reference.

``df.sample()`` draws from a per-partition RNG — results change with
partitioning, retries, and cluster size, which is unacceptable for
reproducible training sets. These operators key every decision off a
content hash (md5-derived 32-bit int, operators/text.py:hash32): the
same row lands in the same split on any cluster, any partitioning, any
engine — and the DuckDB oracle reproduces the exact row set.

Scale shape: a hash + modulo filter/projection — pure codegen, pushed
into the scan pipeline, zero shuffle, no RNG state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from boostdb_spark.operators.text import hash32


def _bucket(key: Column, buckets: int = 10_000) -> Column:
    return F.pmod(hash32(key.cast("string")), F.lit(buckets))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = 10_000
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of
    ``buckets`` hash buckets — a stable ~fraction sample: reproducible
    across runs/partitionings, and monotone (a 20% sample contains the
    10% sample, so growing a training set never resamples).

    The threshold is ``round(fraction*buckets)``, not a truncating
    ``int(...)`` — float rounding made e.g. 0.57*10000 = 5699.999...
    one bucket short of the documented fraction."""
    return df.filter(
        _bucket(F.col(key_col), buckets) < int(round(fraction * buckets))
    )


def train_val_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    buckets: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Label every row 'val' or 'train' by hash bucket — the standard
    leakage-safe split: keyed on content/id, so duplicates of a
    document always land on the same side, regardless of order or
    partitioning."""
    is_val = _bucket(F.col(key_col), buckets) < int(round(val_fraction * buckets))
    return df.withColumn(out_col, F.when(is_val, "val").otherwise("train"))


def pack_tokens(
    df: DataFrame,
    capacity: int,
    n_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_docs: int = 1000,
) -> DataFrame:
    """Concat-and-split sequence packing — the LLM-pretraining step
    that lays documents end to end in ``id_col`` order and cuts the
    stream into fixed ``capacity``-token packs (documents may span pack
    boundaries). Returns one row per (document, pack) overlap:
    (id, pack_id, tok_begin, tok_end) with [tok_begin, tok_end) the
    document-local token slice that lands in that pack. Zero-token
    documents are dropped.

    A naive global running sum would be a single-partition window — a
    non-starter at corpus scale. Instead: documents bucket by
    ``id div bucket_docs``; per-bucket token totals (a tiny aggregate)
    get a prefix-sum window over buckets only, and each document's
    global offset = its bucket's offset + a within-bucket running sum —
    the classic two-phase scan, all shuffles bounded by the bucket
    count, results identical to the sequential layout.
    """
    id_dt = dict(df.dtypes).get(id_col)
    if id_dt not in ("tinyint", "smallint", "int", "bigint", "long"):
        # `_id div N` on a non-integral id yields NULL buckets and the
        # bucket-offset join would silently drop every row
        raise TypeError(
            f"pack_tokens requires an integral {id_col!r} (got {id_dt}); "
            "derive one first, e.g. xxhash64(id) or monotonically_increasing_id"
        )
    x = df.filter(F.col(n_col) > 0).select(
        F.col(id_col).alias("_id"), F.col(n_col).cast("long").alias("_n")
    )
    x = x.withColumn("_b", F.expr(f"_id div {bucket_docs}"))
    btot = x.groupBy("_b").agg(F.sum("_n").alias("_bs"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boff = btot.withColumn("_boff", F.sum("_bs").over(wb) - F.col("_bs")).select(
        "_b", "_boff"
    )
    wi = (
        Window.partitionBy("_b")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = (
        x.join(F.broadcast(boff), "_b")
        .withColumn("_end", F.col("_boff") + F.sum("_n").over(wi))
        .withColumn("_start", F.col("_end") - F.col("_n"))
    )
    cap = F.lit(capacity).cast("long")
    packs = pos.withColumn(
        "pack_id",
        F.explode(
            F.sequence(
                F.expr(f"_start div {capacity}"), F.expr(f"(_end - 1) div {capacity}")
            )
        ),
    )
    return packs.select(
        F.col("_id").alias(id_col),
        F.col("pack_id").cast("long").alias("pack_id"),
        (F.greatest(F.col("pack_id") * cap, F.col("_start")) - F.col("_start")).alias(
            "tok_begin"
        ),
        (F.least((F.col("pack_id") + 1) * cap, F.col("_end")) - F.col("_start")).alias(
            "tok_end"
        ),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-source mixture sampling — the domain-reweighting step of
    corpus assembly ("keep all of wiki, half of books, 10% of web").
    Each row keeps iff its content-hash bucket falls under its
    source's rate: deterministic, monotone in every rate, and
    independent across sources. Unlisted sources get ``default_rate``.

    Scale shape: the rate lookup folds into a literal CASE expression
    (plan-time, no join) and the whole thing is one codegen filter in
    the scan pipeline — zero shuffle, no RNG state.
    """
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    cut = F.floor(rate * buckets).cast("long")
    return df.filter(_bucket(F.col(key_col), buckets) < cut)


def temperature_mixture(
    df: DataFrame,
    temperature: float = 2.0,
    target_fraction: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual/
    multi-domain mixing rule (sampling distribution q_s proportional to
    p_s^(1/T), the mBERT/XLM exponent-smoothing scheme): temperatures
    above 1 upweight small sources relative to their natural share, and
    the whole corpus downsamples to ``target_fraction`` overall.

    NULL sources are kept: the count aggregate gives NULL its own
    group, and the rate join is null-safe, so rows with a NULL source
    are rebalanced under their own derived rate rather than silently
    dropped (explicit policy; mixture_sample's supplied-rate analog is
    its ``default_rate``).

    Unlike :func:`mixture_sample` the per-source rates are DERIVED from
    the data (one tiny per-source count aggregate), not supplied:
    rate_s = min(1, target_fraction * N * q_s / n_s). The decision per
    row is the same deterministic content-hash bucket cut — monotone in
    the target fraction, reproducible on any partitioning.

    Determinism contract: for T = 2 the weight is sqrt(n) (correctly
    rounded IEEE, engine-independent); weights quantize to
    DECIMAL(18,9) before the exact decimal normalization sum so the
    oracle reproduces the rates bit-for-bit. Other temperatures use
    pow(), whose last-ulp behavior is libm-specific — fine for
    production, not for cross-engine hash certification.

    Scale shape: one partial-agg count per source (rows = |sources|),
    one broadcast join of the tiny rate table, one codegen filter. No
    full-data shuffle.
    """
    alpha = 1.0 / temperature
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    w = F.sqrt(F.col("_n")) if alpha == 0.5 else F.pow(F.col("_n"), F.lit(alpha))
    d = counts.withColumn("_d", w.cast("decimal(18,9)"))
    tot = d.agg(
        F.sum("_d").alias("_sum_d"), F.sum("_n").alias("_total_n")
    )
    rate = (
        F.lit(float(target_fraction))
        * F.col("_total_n")
        * F.col("_d").cast("double")
        / (F.col("_sum_d").cast("double") * F.col("_n"))
    )
    rates = d.crossJoin(F.broadcast(tot)).select(
        F.col(source_col).alias("_rate_src"),
        F.floor(F.least(F.lit(1.0), rate) * buckets).cast("long").alias("_cut"),
    )
    # null-safe join: a NULL source is a source like any other — it got
    # its own count group above, so it keeps its own derived rate
    # instead of being silently dropped by inner-join null semantics
    out = df.join(
        F.broadcast(rates),
        F.col(source_col).eqNullSafe(F.col("_rate_src")),
    )
    return out.filter(_bucket(F.col(key_col), buckets) < F.col("_cut")).drop(
        "_cut", "_rate_src"
    )


def repeat_epochs(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_weight: float = 1.0,
    buckets: int = 10_000,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic multi-epoch upsampling — the other half of mixture
    construction next to :func:`mixture_sample` (down-sampling): a
    source with weight 3.5 repeats every doc 3 times and half the docs
    a 4th time ("epochs" in pretraining-mixture terms, e.g. repeating
    high-quality sources). Every row emits epochs 1..floor(w), plus
    epoch ceil(w) iff the (key, epoch)-hash bucket falls under
    frac(w) — reproducible across runs/partitionings, monotone in
    every weight, no RNG.

    Scale shape: the weight lookup folds to a literal CASE, the copies
    come from one ``explode(sequence(...))`` projection and one codegen
    filter — zero shuffle, output size sum(w_s * n_s) by construction.
    """
    wt = F.lit(float(default_weight))
    for src, w in sorted(weights.items()):
        wt = F.when(F.col(source_col) == src, F.lit(float(w))).otherwise(wt)
    cw = F.ceil(wt).cast("int")
    ks = F.when(cw >= 1, F.sequence(F.lit(1), cw)).otherwise(
        F.array().cast("array<int>")
    )
    out = df.withColumn(epoch_col, F.explode(ks))
    frac_cut = F.floor((wt - F.floor(wt)) * buckets).cast("long")
    keep = (F.col(epoch_col) <= F.floor(wt).cast("int")) | (
        _bucket(
            F.concat(
                F.col(key_col).cast("string"),
                F.lit(":"),
                F.col(epoch_col).cast("string"),
            ),
            buckets,
        )
        < frac_cut
    )
    return out.filter(keep)


def shuffle_rank(
    df: DataFrame,
    key_col: str = "doc_id",
    buckets: int = 1024,
    out_col: str = "rank",
) -> DataFrame:
    """Deterministic global shuffle order for training epochs: every
    row gets its 0-based position under ORDER BY (hash32(key), key) —
    a reproducible pseudo-random permutation of the corpus that is
    identical on any cluster and any partitioning (``orderBy(rand())``
    is neither).

    Scale shape — the two-phase global-rank scan (same pattern as
    pack_tokens): rows bucket by the TOP bits of the hash (so bucket
    order == hash order), per-bucket counts (a tiny aggregate) take a
    prefix-sum window over the bucket ids only, and each row's rank =
    its bucket's offset + its within-bucket row_number. No
    single-partition pass ever sees more than one bucket's rows;
    shuffles are bounded by the bucket count.
    """
    span = (1 << 32) // buckets
    h = hash32(F.col(key_col).cast("string"))
    x = df.withColumn("_h", h).withColumn("_b", F.expr(f"_h div {span}"))
    counts = x.groupBy("_b").agg(F.count("*").alias("_n"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boff = counts.withColumn("_off", F.sum("_n").over(wb) - F.col("_n")).select(
        "_b", "_off"
    )
    wi = Window.partitionBy("_b").orderBy("_h", key_col)
    return (
        x.join(F.broadcast(boff), "_b")
        .withColumn(out_col, F.col("_off") + F.row_number().over(wi) - 1)
        .select(*df.columns, out_col)
    )


def interleave_mixture(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted source interleave — the training-order
    twin of the sampling mixers: instead of DROPPING rows to hit a
    mixture (mixture_sample / temperature_mixture), every row gets a
    stride-scheduling virtual time ``vt = src_rank / weight`` (WFQ /
    lottery-stride scheduling), so sorting by (vt, source, src_rank)
    interleaves sources at their weight ratios from the very first
    batch — a weight-3 source contributes ~3 rows for every 1 of a
    weight-1 source at EVERY prefix of the epoch, not just in
    expectation. Curriculum mixing without discarding data.

    Returns df + (src_rank 1-based within source in key order, vt).
    No global row_number is materialized: consumers ``orderBy(vt,
    source)`` — a range-partitioned distributed sort, which scales;
    a global sequence column would funnel through one task. Shuffle
    cost: one window per (source) for the rank — computed with the
    bucketed two-phase scan (pack_tokens' pattern) so no task sorts
    more than one hash bucket of one source.

    Determinism contract: vt is ONE IEEE division of an integer rank
    by the weight literal — correctly rounded, engine-independent,
    certifiable bit-exactly. Weights must be positive."""
    for s, w in weights.items():
        if not w > 0:
            raise ValueError(f"interleave weight for {s!r} must be > 0")
    if not default_weight > 0:
        raise ValueError("default_weight must be > 0")
    # per-source rank via the two-phase scan: bucket by top hash bits
    # of the key; per-(source, bucket) counts prefix-sum WITHIN the
    # source (the counts table is tiny); rank = offset + within-bucket
    # row_number. Bucketing by hash32(key) but ranking by key would
    # break rank==key-order, so the rank orders by (hash, key) — a
    # deterministic pseudo-random within-source order, which is what a
    # training interleave wants anyway (shuffle_rank's contract).
    buckets = 1024
    span = (1 << 32) // buckets
    h = hash32(F.col(key_col).cast("string"))
    x = df.withColumn("_h", h).withColumn("_b", F.expr(f"_h div {span}"))
    counts = x.groupBy(source_col, "_b").agg(F.count("*").alias("_n"))
    wb = (
        Window.partitionBy(source_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boff = counts.withColumn(
        "_off", F.sum("_n").over(wb) - F.col("_n")
    ).select(source_col, "_b", "_off")
    wi = Window.partitionBy(source_col, "_b").orderBy("_h", key_col)
    ranked = (
        x.join(F.broadcast(boff), [source_col, "_b"])
        .withColumn("src_rank", F.col("_off") + F.row_number().over(wi))
        .drop("_h", "_b", "_off")
    )
    wexpr = F.lit(float(default_weight))
    for s, w in sorted(weights.items()):
        wexpr = F.when(F.col(source_col) == s, F.lit(float(w))).otherwise(
            wexpr
        )
    return ranked.withColumn(
        "vt", F.col("src_rank").cast("double") / wexpr
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    cap: int,
    key_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic per-group quota capping — the anti-spam /
    domain-balance half of corpus curation ("no source contributes
    more than N documents"): rank rows within each group by
    (hash32(key), key) — a reproducible pseudo-random order, so the
    kept subset is an unbiased deterministic sample of the group, not
    its head — and keep ``rank <= cap``. Monotone like
    deterministic_sample: raising the cap only ADDS documents.

    Scale: one window shuffle on the group key with a streaming
    row_number frame. A pathologically dominant group concentrates on
    one reducer; for that shape pre-thin with deterministic_sample
    (hash-bucket filter, no shuffle) to ~cap-scale first — the
    composition preserves determinism because both order by the same
    hash.
    """
    h = hash32(F.col(key_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= cap)
    )
