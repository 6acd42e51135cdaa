"""Deduplication operators for large-scale document corpora.

Five families, all shuffle-architected for 100 TB:

- **exact**: hash-groupBy on a content digest (one shuffle, uniform
  keys by construction).
- **fingerprint**: exact dedup over a canonicalized token-set digest
  (catches reorderings).
- **MinHash + LSH**: word-shingle minhash signatures, banded into LSH
  buckets; candidate pairs come from a bucket self-join — never a
  cross join. The shuffle keys are (band, signature): collision groups
  are tiny, so the join is skew-safe.
- **SimHash**: 16-bit locality-sensitive bit signature; near-dups share
  buckets.
- **n-gram Jaccard**: exact Jaccard via an inverted shingle index
  (shingle → docs join), the verification stage downstream of LSH
  candidates.

Determinism contract (shared with the DuckDB oracles): "hash i of
shingle s" is the lexicographic string ``md5(i || '|' || s)`` — a
total order both engines agree on, with no integer-conversion
divergence. Ratios are canonicalized to integer micro-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from async_pipes_spark.functions.text import fingerprint, ws_tokens
from async_pipes_spark.functions.vectors import micro_units

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_SIZE = 2
DEFAULT_SHINGLE = 3


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by md5(text): (h, keep_id, dups)."""
    return df.groupBy(F.md5(text_col).alias("h")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dups"),
    )


def fingerprint_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Dedup by canonical token-set fingerprint: (fp, keep_id, dups)."""
    return df.groupBy(fingerprint(text_col).alias("fp")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dups"),
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Word n-gram shingles, one row per (doc, shingle occurrence)."""
    toks = ws_tokens(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda j: F.array_join(F.slice(toks, j + 1, n), " "),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Banded minhash signatures: (doc_id, band, sig).

    minhash_i(doc) = min over shingles of md5(i || '|' || shingle);
    bands concatenate ``band_size`` consecutive minhashes. Partial
    aggregation keeps the shuffle at one (doc, i, current-min) row per
    map partition, so the k× hash fan-out never hits the network.
    """
    sh = shingles(df, text_col, id_col, shingle_n)
    ids = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i")
    hashed = sh.select("doc_id", ids, "shingle").select(
        "doc_id",
        "i",
        F.md5(F.concat(F.col("i").cast("string"), F.lit("|"), F.col("shingle"))).alias("h"),
    )
    mins = hashed.groupBy("doc_id", "i").agg(F.min("h").alias("mh"))
    return (
        mins.groupBy("doc_id", (F.col("i") - F.col("i") % band_size).alias("_b"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "mh"))), lambda s: s.getField("mh")
                ),
                "|",
            ).alias("sig")
        )
        .select(
            "doc_id",
            (F.col("_b") / band_size).cast("bigint").alias("band"),
            "sig",
        )
    )


def minhash_lsh_pairs(signatures: DataFrame) -> DataFrame:
    """LSH candidate pairs: docs sharing any band signature.

    Self-join on (band, sig) — bucket-local, skew-safe; at 100 TB this
    is the only join and its groups are collision sets, not the corpus.
    """
    a = signatures.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = signatures.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-document SimHash: (doc_id, simhash).

    Bit b of a token's hash = high bit of hex nibble b of md5(token);
    the document bit is the sign of the ±1 vote sum over token
    occurrences. ``bits`` ≤ 32 (one nibble per bit position).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(ws_tokens(text_col)).alias("tok")
    )
    votes = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bits - 1}), b -> "
                "CASE WHEN instr('89abcdef', substring(md5(tok), b + 1, 1)) > 0 "
                "THEN 1 ELSE -1 END)"
            )
        ).alias("b", "v"),
    )
    scores = votes.groupBy("doc_id", "b").agg(F.sum("v").alias("score"))
    return scores.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("score") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Exact n-gram Jaccard for every doc pair sharing ≥1 shingle:
    (doc_a, doc_b, jac_micro).

    Inverted-index shape: distinct (doc, shingle) rows self-join on the
    shingle — pairs materialize only where overlap exists. This is the
    verify stage to run on LSH candidates at scale (join the candidate
    pair set first to bound it)."""
    sh = shingles(df, text_col, id_col, shingle_n).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            micro_units(F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jac_micro"),
        )
    )
