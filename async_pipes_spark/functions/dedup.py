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
from async_pipes_spark.operators.partitioning import fan_out

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
        fan_out(df.filter(F.size(toks) >= n))
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
    # Wide-column form: the k hashes are k columns, not k exploded
    # rows — partial aggregation reduces each map partition to one row
    # per doc BEFORE the shuffle (k× less shuffle input than the
    # explode formulation), and the md5 of the shingle feeds all k
    # hash variants from one projection.
    sh = shingles(df, text_col, id_col, shingle_n)
    hash_cols = [
        F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    mins = sh.select("doc_id", *hash_cols).groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    num_bands = num_hashes // band_size
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("bigint").alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"m{b * band_size + j}") for j in range(band_size)]
                ).alias("sig"),
            )
            for b in range(num_bands)
        ]
    )
    return mins.select("doc_id", F.inline(band_structs))


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
    # Wide-column form: one row per token occurrence carrying all
    # ``bits`` vote columns; partial aggregation collapses to one row
    # per doc map-side (vs. bits× row blowup with posexplode).
    toks = fan_out(df).select(
        F.col(id_col).alias("doc_id"), F.explode(ws_tokens(text_col)).alias("tok")
    ).select("doc_id", F.md5("tok").alias("hx"))
    vote_cols = [
        F.when(F.substring("hx", b + 1, 1).isin(*"89abcdef"), 1).otherwise(-1).alias(f"v{b}")
        for b in range(bits)
    ]
    scores = toks.select("doc_id", *vote_cols).groupBy("doc_id").agg(
        *[F.sum(f"v{b}").alias(f"s{b}") for b in range(bits)]
    )
    bit_terms = [
        F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        for b in range(bits)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return scores.select("doc_id", total.cast("bigint").alias("simhash"))


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
