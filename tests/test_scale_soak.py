"""10× scale soak for the guard paths (VERDICT r2 #10): a synthetic
sf1-equivalent corpus with DELIBERATELY skewed strata — one hot shingle
family (30% of docs share near-identical text) and one hot IVF cell
(40% of vectors cluster around one direction) — asserting the hot-group
caps and blocked tiles engage and keep peak task memory bounded instead
of funneling the stratum into one task.

Marked slow: ~1-2 min on local[32]. Run with
``pytest tests/test_scale_soak.py`` (deselected only if you -k around
it); the default suite includes it so the guards stay exercised.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_DOCS = 50_000
HOT_DOCS = 15_000  # one hot near-duplicate family, 30% of corpus
N_VECS = 20_000
HOT_VECS = 8_000  # one hot IVF cell, 40% of vectors
DIM = 16


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """50k docs; 15k share one 12-token template (differing only in one
    trailing token so shingles collide heavily), the rest unique."""
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    hot = F.concat(
        F.lit("the quick brown fox jumps over the lazy dog again and again v"),
        (F.col("doc_id") % 50).cast("string"),
    )
    cold = F.concat_ws(
        " ",
        *[
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"|{i}")))
            for i in range(12)
        ],
    )
    return base.select(
        "doc_id", F.when(F.col("doc_id") < HOT_DOCS, hot).otherwise(cold).alias("text")
    )


@pytest.fixture(scope="module")
def skewed_vecs(spark):
    """20k vectors; 8k cluster tightly around one direction (one hot
    IVF cell), the rest hash-spread."""

    def coord(i):
        hot = F.lit(1.0) + (F.hash(F.col("vec_id"), F.lit(i)) % 100).cast("float") / F.lit(10_000.0)
        cold = (F.hash(F.col("vec_id"), F.lit(i)) % 1000).cast("float") / F.lit(100.0)
        return F.when(F.col("vec_id") < HOT_VECS, hot if i == 0 else hot / 50).otherwise(cold)

    return spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.array(*[coord(i) for i in range(DIM)]).alias("embedding"),
    )


def test_lsh_hot_bucket_cap_engages_at_scale(spark, skewed_docs):
    """minhash+LSH over the skewed corpus: the hot family's buckets
    exceed max_bucket_size and are dropped by the in-shuffle cap, so
    the pair expansion stays bounded (an uncapped run would attempt
    ~15k²/2 ≈ 112M pairs from the hot family alone)."""
    from async_pipes_spark.functions.dedup import minhash_lsh_pairs, minhash_signatures

    sigs = minhash_signatures(skewed_docs, shingle_n=3)
    pairs = minhash_lsh_pairs(sigs, max_bucket_size=1000)
    n = pairs.count()
    # hot-family buckets (≥15k docs ≫ cap) must be gone; cold docs are
    # unique md5 soup with no real collisions
    assert n < 2_000_000, f"cap failed to bound pair expansion: {n} pairs"


def test_near_dup_blocking_engages_and_is_invariant(spark, skewed_vecs):
    """embedding_near_dups on the hot-cell corpus with a small
    block_size: the hot cell (8k vecs) is split into ceil(8k/512)=16
    blocks → 136 bounded tiles instead of one 8k-row task. Pair count
    must be invariant to block_size (every pair in exactly one tile)."""
    from async_pipes_spark.functions.similarity import embedding_near_dups

    # high threshold: only the hot cluster's near-identical vectors match
    small = embedding_near_dups(
        skewed_vecs.filter((F.col("vec_id") % 20) == 0),  # 1k-vec slice: exact invariance check
        threshold_micro=999_000,
        num_centroids=8,
        block_size=64,
    )
    big = embedding_near_dups(
        skewed_vecs.filter((F.col("vec_id") % 20) == 0),
        threshold_micro=999_000,
        num_centroids=8,
        block_size=100_000,
    )
    n_small, n_big = small.count(), big.count()
    assert n_small == n_big, f"blocking changed the result: {n_small} != {n_big}"
    assert n_small > 0, "skew fixture produced no near-dups — fixture broken"

    # full 20k corpus with blocking engaged: completes with bounded
    # tiles (per-task pair work ≤ block_size² = 262k, not 8k² = 64M)
    full = embedding_near_dups(
        skewed_vecs, threshold_micro=999_500, num_centroids=8, block_size=512
    )
    assert full.count() > 0


def test_salted_agg_on_hot_key(spark, skewed_docs):
    """Salted aggregation over a 30%-hot key distribution matches the
    direct groupBy exactly (retry-deterministic salt)."""
    from async_pipes_spark.operators.skew import salted_aggregate

    tagged = skewed_docs.select(
        F.when(F.col("doc_id") < HOT_DOCS, F.lit("hot")).otherwise(
            F.concat(F.lit("cold"), (F.col("doc_id") % 7).cast("string"))
        ).alias("family"),
        F.length("text").alias("len"),
    )
    direct = {
        r.family: (r.n, r.total)
        for r in tagged.groupBy("family")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("len").alias("total"))
        .collect()
    }
    salted = {
        r.family: (r.n, r.total)
        for r in salted_aggregate(
            tagged, ["family"], [("count", "*", "n"), ("sum", "len", "total")], num_salts=16
        ).collect()
    }
    assert direct == salted


def test_prefix_sum_soak_500k_rows(spark):
    """Distributed prefix scan at 500k rows over 32 range partitions —
    enough data that the range partitioner's reservoir sampling is
    actually sampling (not seeing every row). Spot-check the running
    sum at deterministic probe points against closed-form values:
    v(k) = (k % 97) + 1, so cumsum(K) = sum_{k<=K} ((k % 97) + 1)."""
    from pyspark.sql import functions as F

    from async_pipes_spark.operators.scan import prefix_sum

    n = 500_000
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("v")
    ).repartition(40)
    out = prefix_sum(df, "k", "v", num_partitions=32)

    def closed_form(K):  # sum over k in [0, K] of (k % 97) + 1
        full, rem = divmod(K + 1, 97)
        return full * (97 * 98 // 2) + rem * (rem + 1) // 2

    probes = [0, 1, 96, 97, 123_456, 499_999]
    got = {
        r.k: r.cumsum
        for r in out.filter(F.col("k").isin(probes)).collect()
    }
    assert got == {K: closed_form(K) for K in probes}


def test_knn_join_hot_cell_soak(spark, skewed_vecs):
    """ivf_knn_join against the hot-cell corpus (8k of 20k vectors in
    one IVF cell) with blocking engaged: the hot cell's tiles stay
    bounded (block_size² pair work per task) and every query still
    gets exactly k ranked neighbors; a 1k-vec slice pins blocking
    invariance exactly."""
    from async_pipes_spark.functions.similarity import ivf_knn_join

    slice_ = skewed_vecs.filter((F.col("vec_id") % 20) == 0)
    queries = slice_.filter(F.col("vec_id") % 100 == 0)
    tiled = {
        tuple(r)
        for r in ivf_knn_join(
            queries, slice_, k=3, num_centroids=8, nprobe=2, block_size=64
        ).collect()
    }
    unblocked = {
        tuple(r)
        for r in ivf_knn_join(
            queries, slice_, k=3, num_centroids=8, nprobe=2, block_size=100_000
        ).collect()
    }
    assert tiled == unblocked and len(tiled) > 0

    # full 20k corpus, 200 queries, blocking engaged on the hot cell
    q200 = skewed_vecs.filter(F.col("vec_id") % 100 == 0)
    out = ivf_knn_join(
        q200, skewed_vecs, k=3, num_centroids=8, nprobe=2, block_size=512
    )
    rows = out.collect()
    n_q = q200.count()
    assert len(rows) == 3 * n_q
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
