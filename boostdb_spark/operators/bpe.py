"""Distributed BPE tokenizer training — the classic byte-pair-encoding
merge loop (Sennrich et al. 2016, public algorithm) expressed as
grouped aggregates over the DISTINCT-WORD table, so corpus size only
matters once.

Shape per merge round (the 100 TB posture):

1. the corpus collapses to ``(word, count)`` ONCE — every later pass
   runs over distinct words (bounded by vocabulary, not corpus);
2. adjacent-pair counts are one explode + hash aggregate with map-side
   partials; only the single argmax row is collected per round
   (scalar-only driver traffic, same convergence contract as
   ``dedup_groups``);
3. the merge rewrite is a declarative left fold over each word's
   symbol array (JVM codegen, no UDF), left-to-right non-overlapping
   like the reference algorithm;
4. the lineage is ``localCheckpoint``-flattened every few rounds so N
   merges never builds an N-deep plan.

Determinism: ties on pair count break lexicographically, so repeated
trainings on the same corpus give the identical merge sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (kept out of the ASCII range of real tokens)
END = "▁"


def words_with_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus -> (word, n) distinct pre-token table — the one
    corpus-sized pass of BPE training."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.split(txt, r"[^a-z0-9]+" if lowercase else r"\s+")
    return (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols() -> F.Column:
    """word -> array of single-character symbols + end sentinel."""
    return F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))


def _merge_fold(a: str, b: str) -> F.Column:
    """Rewrite each symbol array replacing adjacent (a, b) with a+b,
    left-to-right non-overlapping — a single declarative fold with a
    (out, pending) accumulator and a finish lambda."""
    merged = a + b

    def step(acc, s):
        pending = acc["p"]
        hit = pending.eqNullSafe(F.lit(a)) & (s == F.lit(b))
        return F.struct(
            F.when(hit, F.concat(acc["o"], F.array(F.lit(merged))))
            .when(pending.isNull(), acc["o"])
            .otherwise(F.concat(acc["o"], F.array(pending)))
            .alias("o"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("p"),
        )

    def finish(acc):
        return F.when(
            acc["p"].isNull(), acc["o"]
        ).otherwise(F.concat(acc["o"], F.array(acc["p"])))

    init = F.struct(
        F.array().cast("array<string>").alias("o"),
        F.lit(None).cast("string").alias("p"),
    )
    return F.aggregate(F.col("syms"), init, step, finish)


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    ``[(rank, left, right, pair_count), ...]`` in merge order —
    deterministic (count desc, then lexicographic pair) for a given
    corpus. Stops early when no pair reaches ``min_pair_count``."""
    words = (
        words_with_counts(df, text_col)
        .select(_initial_symbols().alias("syms"), "n")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        idx = F.sequence(F.lit(0), F.size("syms") - 2)
        pairs = words.filter(F.size("syms") >= 2).select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i + 1).alias("a"),
                        F.element_at(F.col("syms"), i + 2).alias("b"),
                    ),
                )
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, cnt))
        words = words.select(_merge_fold(a, b).alias("syms"), "n")
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    return merges


def train_bpe_sequential(
    word_counts: dict[str, int],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """The classic single-process BPE merge loop (Sennrich et al.
    2016) over an in-memory ``{word: count}`` table — an INDEPENDENT
    code path from the distributed ``train_bpe`` (dict folds here vs
    grouped aggregates + declarative array rewrites there), kept in
    the package so the ``txt_bpe_certified`` suite entry can assert
    distributed == sequential merge-for-merge under the driver's hash
    gate. Same determinism contract: ties break (count desc, then
    lexicographic pair); same left-to-right non-overlapping rewrite."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in word_counts.items():
        syms = tuple(list(w) + [END])
        vocab[syms] = vocab.get(syms, 0) + n
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        merged = a + b
        rewritten: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            j = 0
            while j < len(syms):
                if (
                    j < len(syms) - 1
                    and syms[j] == a
                    and syms[j + 1] == b
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            key = tuple(out)
            rewritten[key] = rewritten.get(key, 0) + n
        vocab = rewritten
    return merges


def merge_table_fingerprint(
    merges: list[tuple[int, str, str, int]]
) -> str:
    """Canonical sha256 fingerprint of a merge table — the
    driver-visible 'merge-table hash' the certificate entry compares
    between the distributed and sequential trainers."""
    import hashlib

    canon = "|".join(f"{r}:{a}:{b}:{n}" for r, a, b, n in merges)
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize documents with a learned merge list -> (id, n_tokens,
    tokens). The merge table broadcasts inside an Arrow-batched
    mapInPandas (ranked-merge loop per word, the standard apply
    algorithm) — partition-local, scan-speed.

    ``lowercase`` must MATCH the ``words_with_counts`` setting the
    merges were trained with — mismatched pre-tokenization means no
    learned merge ever fires and every word silently degrades to
    characters."""
    import re
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    ranks = {(a, b): r for r, a, b, _ in merges}
    word_re = re.compile(r"[a-z0-9]+" if lowercase else r"\S+")

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [END]
        while len(syms) >= 2:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            _, i = best
            a, b = syms[i], syms[i + 1]
            out = []
            j = 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            toks = [
                [
                    s
                    for w in word_re.findall(
                        str(t).lower() if lowercase else str(t)
                    )
                    for s in encode_word(w)
                ]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_tokens": [len(t) for t in toks],
                    "tokens": toks,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(batches, schema)
